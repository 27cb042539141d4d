"""Pallas fused chain-step kernel vs the jnp formulation it replaces
(hmm_step_sm + variant select + shift merge), bit-exact on random
data, incl. the custom_vmap batch-folded path.  Runs in interpret mode
on CPU; the same kernel compiles for TPU.  The production decoder does
NOT use it (measured slower than XLA's fusions; docs/PERF_NOTES.md) —
it is kept as a validated kernel study."""

import numpy as np
import pytest


def _ref_block(S, TF, CTX, VAR, pre, prevd, tp4, fm, nv, pip):
    """The existing jnp chain-block semantics (ngram_fused step)."""
    import jax
    import jax.numpy as jnp
    from pocketsphinx_tpu.ops.hmm import hmm_step_sm

    NST, D, W = S.shape
    RF = prevd.shape[1]

    def first_select(vals, var, n):
        v = jnp.minimum(var, n - 1)[None, :]
        oh = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) == v
        return jnp.sum(jnp.where(oh, vals, 0.0), axis=0)

    sen = []
    for j in range(NST):
        sf = first_select(-prevd[j], VAR[j], nv)
        s = -pre[j]
        s = jnp.where(fm, sf[None, :], s)
        sen.append(s)
    metas = (tuple(TF), tuple(CTX),
             tuple(jnp.broadcast_to(v[None, :], (D, W)) for v in VAR))
    newS, (nTF, nCTX, nVARd), out, _, (oTF, oCTX, _) = hmm_step_sm(
        tuple(S), tuple(sen), tp4, metas=metas)
    sh = jnp.concatenate([jnp.full((1, W), -1e30), out[:-1]]) + pip
    sh = jnp.where(fm, -1e30, sh)
    shTF = jnp.concatenate([oTF[:1], oTF[:-1]])
    shCX = jnp.concatenate([oCTX[:1], oCTX[:-1]])
    win = sh > newS[0]
    s0 = jnp.where(win, sh, newS[0])
    tf0 = jnp.where(win, shTF, nTF[0])
    cx0 = jnp.where(win, shCX, nCTX[0])
    newVAR = tuple(jnp.sum(jnp.where(fm, v, 0), axis=0) for v in nVARd)
    return ((s0,) + newS[1:], (tf0,) + nTF[1:], (cx0,) + nCTX[1:],
            newVAR, out[-1], oTF[-1], oCTX[-1])


@pytest.mark.parametrize("NST,D,W,RF", [(3, 6, 200, 4), (5, 3, 130, 2)])
def test_chain_step_matches_jnp(NST, D, W, RF):
    import jax.numpy as jnp
    from pocketsphinx_tpu.ops.pallas_chain import chain_step

    rng = np.random.RandomState(7)
    S = rng.randn(NST, D, W).astype(np.float32) * 30
    TF = rng.randint(0, 99, (NST, D, W)).astype(np.int32)
    CTX = rng.randint(0, 999, (NST, D, W)).astype(np.int32)
    VAR = rng.randint(0, RF, (NST, W)).astype(np.int32)
    pre = (rng.rand(NST, D, W) * 80).astype(np.float32)
    prevd = (rng.rand(NST, RF, W) * 80).astype(np.float32)
    tp4 = -(rng.rand(D, W, NST, NST + 1) * 5).astype(np.float32)
    fd = rng.randint(0, D, W)
    fm = (np.arange(D)[:, None] == fd[None, :])
    nv = rng.randint(1, RF + 1, W).astype(np.int32)
    pip = np.float32(-0.7)

    rS, rTF, rCX, rVR, reS, reTF, reCX = _ref_block(
        jnp.asarray(S), [jnp.asarray(TF[j]) for j in range(NST)],
        [jnp.asarray(CTX[j]) for j in range(NST)],
        [jnp.asarray(VAR[j]) for j in range(NST)],
        jnp.asarray(pre), jnp.asarray(prevd), jnp.asarray(tp4),
        jnp.asarray(fm), jnp.asarray(nv), pip)

    tp_planes = jnp.asarray(
        np.transpose(tp4, (2, 3, 0, 1)).reshape(NST * (NST + 1), D, W))
    kS, kTF, kCX, kVR, keS, keTF, keCX = chain_step(
        jnp.asarray(S), jnp.asarray(TF), jnp.asarray(CTX),
        jnp.asarray(VAR), jnp.asarray(pre), jnp.asarray(prevd),
        tp_planes, jnp.asarray(fm), jnp.asarray(nv), pip,
        interpret=True)

    for j in range(NST):
        np.testing.assert_array_equal(np.asarray(kS[j]), np.asarray(rS[j]))
        np.testing.assert_array_equal(np.asarray(kTF[j]),
                                      np.asarray(rTF[j]))
        np.testing.assert_array_equal(np.asarray(kCX[j]),
                                      np.asarray(rCX[j]))
        np.testing.assert_array_equal(np.asarray(kVR[j]),
                                      np.asarray(rVR[j]))
    np.testing.assert_array_equal(np.asarray(keS), np.asarray(reS))
    np.testing.assert_array_equal(np.asarray(keTF), np.asarray(reTF))
    np.testing.assert_array_equal(np.asarray(keCX), np.asarray(reCX))


def test_chain_step_vmap_batched():
    """Under jax.vmap the custom_vmap rule folds the batch axis into
    the pallas block (round-4 B x W_tile layout); results must equal
    per-element application."""
    import jax
    import jax.numpy as jnp
    from pocketsphinx_tpu.ops.pallas_chain import chain_step

    NST, D, W, RF, B = 3, 4, 150, 3, 5
    rng = np.random.RandomState(11)
    S = rng.randn(B, NST, D, W).astype(np.float32) * 30
    TF = rng.randint(0, 99, (B, NST, D, W)).astype(np.int32)
    CTX = rng.randint(0, 999, (B, NST, D, W)).astype(np.int32)
    VAR = rng.randint(0, RF, (B, NST, W)).astype(np.int32)
    pre = (rng.rand(B, NST, D, W) * 80).astype(np.float32)
    prevd = (rng.rand(B, NST, RF, W) * 80).astype(np.float32)
    tp4 = -(rng.rand(D, W, NST, NST + 1) * 5).astype(np.float32)
    tp_planes = jnp.asarray(
        np.transpose(tp4, (2, 3, 0, 1)).reshape(NST * (NST + 1), D, W))
    fd = rng.randint(0, D, W)
    fm = jnp.asarray(np.arange(D)[:, None] == fd[None, :])
    nv = jnp.asarray(rng.randint(1, RF + 1, W).astype(np.int32))
    pip = np.float32(-0.7)

    fn = lambda s, tf, cx, vr, pr, pv: chain_step(
        s, tf, cx, vr, pr, pv, tp_planes, fm, nv, pip, interpret=True)
    outs_v = jax.vmap(fn)(jnp.asarray(S), jnp.asarray(TF),
                          jnp.asarray(CTX), jnp.asarray(VAR),
                          jnp.asarray(pre), jnp.asarray(prevd))
    for b in range(B):
        outs_1 = fn(jnp.asarray(S[b]), jnp.asarray(TF[b]),
                    jnp.asarray(CTX[b]), jnp.asarray(VAR[b]),
                    jnp.asarray(pre[b]), jnp.asarray(prevd[b]))
        for ov, o1 in zip(outs_v, outs_1):
            np.testing.assert_array_equal(np.asarray(ov)[b],
                                          np.asarray(o1))


# NOTE: the decoder-integration path (PS_PALLAS) was retired in round 4
# after the batch-folded kernel still measured behind XLA's fusions on
# turtle B=512 (4.34 vs 3.79 ms/step, docs/PERF_NOTES.md); the kernel
# above remains a validated study with exact semantics.
