"""Exactness of the fused pallas fan kernel (ops/pallas_fan.py) vs the
jnp formulation it replaces (hmm_step_sm + one-hot expansion + entry
merge + argmax_payload), on random data, single and under vmap."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocketsphinx_tpu.ops.hmm import hmm_step_sm
from pocketsphinx_tpu.ops.pallas_fan import fan_step, NEG_INF


def _ref_fan(S, TF, CX, pred, ptf, pcx, pre, lp, tp):
    """The exact jnp formulation from search/ngram_fused.py's finals
    block (expansion via f32 one-hot matmul at HIGHEST precision)."""
    NRC, W = S.shape[1:]
    oh = (lp[None, :] == np.arange(pre.shape[-1])[:, None]).astype(
        np.float32)
    prex = jnp.einsum("jrn,nw->jrw", jnp.asarray(pre), jnp.asarray(oh),
                      precision=jax.lax.Precision.HIGHEST)
    sen = tuple(-prex[j] for j in range(3))
    tpw = jnp.asarray(tp.reshape(3, 4, -1).transpose(2, 0, 1))  # [W,3,4]
    Ss = tuple(jnp.asarray(S[j]) for j in range(3))
    metas = (tuple(jnp.asarray(TF[j]) for j in range(3)),
             tuple(jnp.asarray(CX[j]) for j in range(3)))
    newS, (nTF, nCX), out_f, _, (oTF, oCX) = hmm_step_sm(
        Ss, sen, tpw, metas=metas)
    win = jnp.asarray(pred)[None, :] > newS[0]
    s0 = jnp.where(win, pred[None, :], newS[0])
    tf0 = jnp.where(win, ptf[None, :], nTF[0])
    cx0 = jnp.where(win, pcx[None, :], nCX[0])
    esc = jnp.max(out_f, axis=0)
    am = jnp.argmax(out_f, axis=0)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (NRC, W), 0) == am[None])
    etf = jnp.sum(jnp.where(sel, oTF, 0), axis=0)
    ecx = jnp.sum(jnp.where(sel, oCX, 0), axis=0)
    return (jnp.stack([s0] + list(newS[1:])),
            jnp.stack([tf0] + list(nTF[1:])),
            jnp.stack([cx0] + list(nCX[1:])),
            out_f, esc, etf, ecx)


def _mk(rng, NRC, W, LP, T_max=400, ties=False):
    S = rng.uniform(-50, 0, (3, NRC, W)).astype(np.float32)
    if ties:
        S = np.round(S)          # provoke equal candidates
    S[0, :, : W // 7] = NEG_INF
    TF = rng.integers(0, T_max, (3, NRC, W)).astype(np.int32)
    CX = rng.integers(0, 1 << 20, (3, NRC, W)).astype(np.int32)
    pred = rng.uniform(-50, 0, W).astype(np.float32)
    if ties:
        pred = np.round(pred)
    pred[:: 5] = NEG_INF
    ptf = rng.integers(0, T_max, W).astype(np.int32)
    pcx = rng.integers(0, 1 << 20, W).astype(np.int32)
    pre = rng.uniform(0, 60, (3, NRC, LP)).astype(np.float32)
    lp = rng.integers(0, LP, W).astype(np.int32)
    tp = rng.uniform(-12, 0, (12, W)).astype(np.float32)
    if ties:
        tp = np.round(tp)
    tp[3] = NEG_INF              # tp[0 -> exit] impossible
    return S, TF, CX, pred, ptf, pcx, pre, lp, tp


@pytest.mark.parametrize("shape", [(11, 257, 37), (41, 640, 601)])
@pytest.mark.parametrize("ties", [False, True])
def test_fan_step_exact(shape, ties):
    NRC, W, LP = shape
    rng = np.random.default_rng(7 if ties else 3)
    args = _mk(rng, NRC, W, LP, ties=ties)
    ref = _ref_fan(*args)
    got = fan_step(*[jnp.asarray(a) for a in args],
                   interpret=True)
    names = ["S", "TF", "CX", "out_f", "esc", "etf", "ecx"]
    for n, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert r.shape == g.shape, n
        np.testing.assert_array_equal(r, g, err_msg=n)


def test_fan_step_vmap():
    NRC, W, LP, B = 9, 150, 23, 5
    rng = np.random.default_rng(11)
    per_b = [_mk(rng, NRC, W, LP) for _ in range(B)]
    # batch S/TF/CX/pred/ptf/pcx/pre; lp/tp unbatched (use batch 0's)
    lp, tp = per_b[0][7], per_b[0][8]
    batched = [np.stack([pb[i] for pb in per_b]) for i in range(7)]
    got = jax.vmap(
        lambda S, TF, CX, pred, ptf, pcx, pre: fan_step(
            S, TF, CX, pred, ptf, pcx, pre, jnp.asarray(lp),
            jnp.asarray(tp), interpret=True))(
        *[jnp.asarray(b) for b in batched])
    for b in range(B):
        ref = _ref_fan(*(tuple(batched[i][b] for i in range(7))
                         + (lp, tp)))
        for n, r, g in zip(["S", "TF", "CX", "out_f", "esc", "etf",
                            "ecx"], ref, got):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g)[b], err_msg=f"{n} b={b}")


def test_bf16x3_onehot_identity():
    """The 3-pass bf16 value-split one-hot matmul reconstructs the f32
    product bit-exactly (the identity ngram_fused.oh_matmul and the
    fan kernel rely on), including extreme magnitudes and integers."""
    rng = np.random.default_rng(5)
    vals = np.concatenate([
        rng.uniform(-1e5, 0, (7, 300)).astype(np.float32),
        np.float32(rng.integers(0, 1 << 24, (7, 300))),
        np.full((7, 300), NEG_INF, np.float32),
    ], axis=0).astype(np.float32)                      # [21, 300]
    idx = rng.integers(0, 300, 97)
    oh = (idx[:, None] == np.arange(300)[None, :]).astype(np.float32)

    v = jnp.asarray(vals)
    ohb = jnp.asarray(oh).astype(jnp.bfloat16)
    a1 = v.astype(jnp.bfloat16)
    r1 = v - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for a in (a1, a2, a3):
        p = jnp.einsum("vn,kn->vk", a, ohb,
                       preferred_element_type=jnp.float32)
        out = p if out is None else out + p
    ref = vals[:, idx]                                 # exact selection
    np.testing.assert_array_equal(np.asarray(out), ref)
