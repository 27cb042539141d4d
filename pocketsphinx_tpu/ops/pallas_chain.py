"""Pallas TPU kernel: fused per-frame chain-bucket update, batched.

One pallas_call replaces the ~35 small XLA kernels of the fused
decoder's chain block (search/ngram_fused.py step): variant senone
select -> NST-state Viterbi update with TF/CTX/VAR token metadata
(ops/hmm.py hmm_step_sm semantics, src/hmm.c hmm_vit_eval tie rules) ->
intra-word shift merge -> exit-row extraction.

Round-3 finding (docs/PERF_NOTES.md): under `jax.vmap` the batch axis
became a serial grid dimension of small blocks and the kernel LOST to
XLA's fusions (4.43 vs 3.65 ms/step, turtle B=512).  Round 4 folds the
batch INTO the block instead: `chain_step` carries a
`jax.custom_batching.custom_vmap` rule whose batched implementation
tiles [B_TILE, NST, D, W_TILE] blocks — batch rides the sublane axis,
words ride the 128-lane axis, and the structural tables (tp, fm, nv)
stay unbatched and re-used across the batch block.

Everything is elementwise/select over [D, W] planes with static
structure — no gathers, no dynamic shapes.  Exactness: same op order
and f32 arithmetic as the jnp formulation; asserted against
hmm_step_sm + shift merge on random data in tests/test_pallas_chain.py
(interpret mode on CPU, compiled on TPU), including under vmap.
"""

from __future__ import annotations

import functools

import numpy as np

NEG_INF = -1e30
B_TILE = 8


def _kernel(nv_ref, pip_ref,
            s_ref, tf_ref, cx_ref, var_ref,
            pre_ref, prevd_ref, tp_ref, fm_ref,
            os_ref, otf_ref, ocx_ref, ovar_ref,
            es_ref, etf_ref, ecx_ref,
            *, NST, D, RF, has_var):
    """Batched chain-block step on one [Bt, ·, ·, W_TILE] block.

    s/tf/cx: [Bt, NST, D, W]; var: [Bt, NST, W]; pre: [Bt, NST, D, W];
    prevd: [Bt, NST, RF, W]; tp: [NST*(NST+1), D, W] (unbatched);
    fm: [D, W]; nv: [1, W]."""
    import jax.numpy as jnp

    pip = pip_ref[0, 0]
    neg = jnp.float32(NEG_INF)
    fm = fm_ref[:, :] != 0                       # [D, W]

    # --- senone goodness per state: variant-select on first rows ------
    sen = []
    for j in range(NST):
        s = -pre_ref[:, j]                       # [Bt, D, W]
        if has_var:
            v = jnp.minimum(var_ref[:, j], nv_ref[0] - 1)   # [Bt, W]
            sf = jnp.zeros_like(s[:, 0])         # [Bt, W]
            for r in range(RF):
                sf = jnp.where(v == r, -prevd_ref[:, j, r], sf)
            s = jnp.where(fm, sf[:, None, :], s)
        sen.append(s)

    # --- hmm_step_sm (ops/hmm.py:90-135, exact op order) --------------
    s_in = [s_ref[:, j] + sen[j] for j in range(NST)]
    TPI = lambda a, b: tp_ref[a * (NST + 1) + b]           # [D, W]
    lo = s_in[NST - 2] + TPI(NST - 2, NST)
    hi = s_in[NST - 1] + TPI(NST - 1, NST)
    hw = hi > lo
    out = jnp.where(hw, hi, lo)                  # [Bt, D, W]
    otf = jnp.where(hw, tf_ref[:, NST - 1], tf_ref[:, NST - 2])
    ocx = jnp.where(hw, cx_ref[:, NST - 1], cx_ref[:, NST - 2])

    newS = [None] * NST
    newTF = [None] * NST
    newCX = [None] * NST
    newVR = [None] * NST
    for j in range(NST - 1, 0, -1):
        prev = s_in[j - 1] + TPI(j - 1, j)
        self_ = s_in[j] + TPI(j, j)
        best = jnp.maximum(prev, self_)
        take_self = self_ > prev
        tfv = jnp.where(take_self, tf_ref[:, j], tf_ref[:, j - 1])
        cxv = jnp.where(take_self, cx_ref[:, j], cx_ref[:, j - 1])
        if has_var:
            vrv = jnp.where(take_self, var_ref[:, j][:, None, :],
                            var_ref[:, j - 1][:, None, :])
        if j >= 2:
            skip = s_in[j - 2] + TPI(j - 2, j)
            take_skip = skip > best
            best = jnp.where(take_skip, skip, best)
            tfv = jnp.where(take_skip, tf_ref[:, j - 2], tfv)
            cxv = jnp.where(take_skip, cx_ref[:, j - 2], cxv)
            if has_var:
                vrv = jnp.where(take_skip,
                                var_ref[:, j - 2][:, None, :], vrv)
        newS[j], newTF[j], newCX[j] = best, tfv, cxv
        if has_var:
            newVR[j] = vrv                       # [Bt, D, W]
    newS[0] = s_in[0] + TPI(0, 0)
    newTF[0], newCX[0] = tf_ref[:, 0], cx_ref[:, 0]

    # --- intra-word shift merge into state 0 --------------------------
    zrow = jnp.full_like(out[:, 0:1], neg)
    sh = jnp.concatenate([zrow, out[:, :-1]], axis=1) + pip
    sh = jnp.where(fm, neg, sh)
    shTF = jnp.concatenate([otf[:, 0:1], otf[:, :-1]], axis=1)
    shCX = jnp.concatenate([ocx[:, 0:1], ocx[:, :-1]], axis=1)
    win = sh > newS[0]
    newS[0] = jnp.where(win, sh, newS[0])
    newTF[0] = jnp.where(win, shTF, newTF[0])
    newCX[0] = jnp.where(win, shCX, newCX[0])

    for j in range(NST):
        os_ref[:, j] = newS[j]
        otf_ref[:, j] = newTF[j]
        ocx_ref[:, j] = newCX[j]
        if has_var and j > 0:
            # VAR carries per word: propagated value at the first row
            vb = jnp.broadcast_to(newVR[j], out.shape)
            ovar_ref[:, j] = jnp.sum(jnp.where(fm, vb, 0), axis=1)
        else:
            ovar_ref[:, j] = var_ref[:, j] if has_var \
                else jnp.zeros_like(var_ref[:, j])

    # --- exit row (depth D-1) for finals/word transitions -------------
    es_ref[:, 0] = out[:, D - 1]
    etf_ref[:, 0] = otf[:, D - 1]
    ecx_ref[:, 0] = ocx[:, D - 1]


def _chain_call(S, TF, CTX, VAR, pre, prevd, tp, fm, nv, pip_arr,
                interpret):
    """Batched pallas_call: S/TF/CTX [B, NST, D, W], VAR [B, NST, W],
    pre [B, NST, D, W], prevd [B, NST, RF, W]; tp/fm/nv unbatched."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, NST, D, W = S.shape
    has_var = VAR is not None
    RF = prevd.shape[2] if has_var else 1
    TILE = min(512, max(128, 1 << max(W - 1, 1).bit_length()))
    Wp = -(-W // TILE) * TILE
    Bt = min(B_TILE, B)
    Bp = -(-B // Bt) * Bt

    def padw(x, fill=0, batched=True):
        cfg = [(0, 0)] * x.ndim
        cfg[-1] = (0, Wp - x.shape[-1])
        if batched:
            cfg[0] = (0, Bp - x.shape[0])
        if any(c != (0, 0) for c in cfg):
            x = jnp.pad(x, cfg, constant_values=fill)
        return x

    Sp = padw(S, NEG_INF)
    TFp, CXp = padw(TF), padw(CTX)
    VARp = padw(VAR) if has_var else jnp.zeros((Bp, NST, Wp), jnp.int32)
    prep = padw(pre)
    prevd_p = padw(prevd) if has_var \
        else jnp.zeros((Bp, NST, RF, Wp), jnp.float32)
    tpp = padw(tp, NEG_INF, batched=False)
    fmp = padw(fm.astype(jnp.int8), batched=False)
    nvp = padw(nv.astype(jnp.int32)[None, :], 1, batched=False)

    grid = (Bp // Bt, Wp // TILE)

    def bsb(prefix):
        """Batched operand: block [Bt, *prefix, TILE]."""
        n = len(prefix)
        return pl.BlockSpec((Bt,) + prefix + (TILE,),
                            lambda b, i, n=n: (b,) + (0,) * n + (i,),
                            memory_space=pltpu.VMEM)

    def bsu(prefix):
        """Unbatched table: block [*prefix, TILE], same for every b."""
        n = len(prefix)
        return pl.BlockSpec(prefix + (TILE,),
                            lambda b, i, n=n: (0,) * n + (i,),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, NST=NST, D=D, RF=RF,
                             has_var=has_var)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsu((1,)),                                      # nv
            pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),          # pip
            bsb((NST, D)), bsb((NST, D)), bsb((NST, D)),    # S TF CTX
            bsb((NST,)),                                    # VAR
            bsb((NST, D)),                                  # pre
            bsb((NST, RF)),                                 # prevd
            bsu((NST * (NST + 1), D)),                      # tp
            bsu((D,)),                                      # fm
        ],
        out_specs=[bsb((NST, D)), bsb((NST, D)), bsb((NST, D)),
                   bsb((NST,)), bsb((1,)), bsb((1,)), bsb((1,))],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, NST, D, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, NST, D, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, NST, D, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, NST, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(nvp, pip_arr, Sp, TFp, CXp, VARp, prep, prevd_p, tpp, fmp)
    nS, nTF, nCX, nVR, eS, eTF, eCX = outs
    cut = lambda x: x[:B, ..., :W]
    return (cut(nS), cut(nTF), cut(nCX), cut(nVR),
            cut(eS)[:, 0], cut(eTF)[:, 0], cut(eCX)[:, 0])


@functools.lru_cache(maxsize=None)
def _chain_op(has_var, interpret):
    """custom_vmap-wrapped single-utterance op: under jax.vmap the
    batch axis folds into the pallas block's sublane axis instead of
    becoming a serial grid dimension."""
    import jax
    import jax.numpy as jnp

    @jax.custom_batching.custom_vmap
    def op(S, TF, CTX, VAR, pre, prevd, tp, fm, nv, pip_arr):
        outs = _chain_call(S[None], TF[None], CTX[None],
                           VAR[None] if has_var else None,
                           pre[None],
                           prevd[None] if has_var else None,
                           tp, fm, nv, pip_arr, interpret)
        return tuple(o[0] for o in outs)

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, S, TF, CTX, VAR, pre, prevd,
                 tp, fm, nv, pip_arr):
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        bS, bTF, bCX, bVAR, bpre, bprevd = in_batched[:6]
        outs = _chain_call(
            ensure(S, bS), ensure(TF, bTF), ensure(CTX, bCX),
            ensure(VAR, bVAR) if has_var else None,
            ensure(pre, bpre),
            ensure(prevd, bprevd) if has_var else None,
            tp, fm, nv, pip_arr, interpret)
        return tuple(outs), tuple([True] * 7)

    return op


def chain_step(S, TF, CTX, VAR, pre, prevd, tp, fm, nv, pip,
               interpret=False):
    """Fused chain-bucket step (vmap-aware; see module docstring).

    S/TF/CTX: [NST, D, W] f32/i32/i32; VAR: [NST, W] i32 or None;
    pre: [NST, D, W] f32 senone costs; prevd: [NST, RF, W] f32 variant
    costs or None; tp: [NST*(NST+1), D, W] f32; fm: [D, W] first-node
    mask; nv: [W] i32 variant counts; pip: scalar float.

    Returns (newS, newTF, newCTX, newVAR [NST, W],
             exit_score [W], exit_tf [W], exit_ctx [W])."""
    import jax.numpy as jnp

    has_var = VAR is not None
    op = _chain_op(has_var, bool(interpret))
    pip_arr = jnp.full((1, 1), pip, jnp.float32)
    return op(S, TF, CTX, VAR, pre, prevd, tp, fm, nv, pip_arr)
