"""Pallas TPU kernel: fused per-frame chain-bucket update.

One pallas_call replaces the ~35 small XLA kernels of the fused
decoder's chain block (search/ngram_fused.py step): variant senone
select -> NST-state Viterbi update with TF/CTX/VAR token metadata
(ops/hmm.py hmm_step_sm semantics, src/hmm.c hmm_vit_eval tie rules) ->
intra-word shift merge -> exit-row extraction.  Kernel count, not
element count, dominates the scan-step cost on TPU
(docs/PERF_NOTES.md), so fusing the block is the speed-of-light lever
BASELINE.json names.

Everything is elementwise/select over [D, W] planes with static
structure — no gathers, no dynamic shapes.  The W axis is tiled onto
the 128-lane grid; depth and the state index live in sublanes.

Exactness: same op order and f32 arithmetic as the jnp formulation;
asserted against hmm_step_sm + shift merge on random data in
tests/test_pallas_chain.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

NEG_INF = -1e30


def _kernel(nv_ref, pip_ref,
            s_ref, tf_ref, cx_ref, var_ref,
            pre_ref, prevd_ref, tp_ref, fm_ref,
            os_ref, otf_ref, ocx_ref, ovar_ref,
            es_ref, etf_ref, ecx_ref,
            *, NST, D, RF, has_var):
    import jax.numpy as jnp

    pip = pip_ref[0, 0]
    neg = jnp.float32(NEG_INF)
    fm = fm_ref[:, :] != 0                       # [D, W]

    # --- senone goodness per state: variant-select on first rows ------
    sen = []
    for j in range(NST):
        s = -pre_ref[j]                          # [D, W]
        if has_var:
            v = jnp.minimum(var_ref[j:j + 1, :], nv_ref[0:1, :] - 1)
            sf = jnp.zeros_like(s[0:1])          # [1, W]
            for r in range(RF):
                sf = jnp.where(v == r, -prevd_ref[j, r:r + 1, :], sf)
            s = jnp.where(fm, sf, s)
        sen.append(s)

    # --- hmm_step_sm (ops/hmm.py:90-135, exact op order) --------------
    s_in = [s_ref[j] + sen[j] for j in range(NST)]
    TPI = lambda a, b: tp_ref[a * (NST + 1) + b]
    lo = s_in[NST - 2] + TPI(NST - 2, NST)
    hi = s_in[NST - 1] + TPI(NST - 1, NST)
    hw = hi > lo
    out = jnp.where(hw, hi, lo)                  # [D, W]
    otf = jnp.where(hw, tf_ref[NST - 1], tf_ref[NST - 2])
    ocx = jnp.where(hw, cx_ref[NST - 1], cx_ref[NST - 2])

    newS = [None] * NST
    newTF = [None] * NST
    newCX = [None] * NST
    newVR = [None] * NST
    for j in range(NST - 1, 0, -1):
        prev = s_in[j - 1] + TPI(j - 1, j)
        self_ = s_in[j] + TPI(j, j)
        best = jnp.maximum(prev, self_)
        take_self = self_ > prev
        tfv = jnp.where(take_self, tf_ref[j], tf_ref[j - 1])
        cxv = jnp.where(take_self, cx_ref[j], cx_ref[j - 1])
        if has_var:
            vrv = jnp.where(take_self, var_ref[j:j + 1, :],
                            var_ref[j - 1:j, :])
        if j >= 2:
            skip = s_in[j - 2] + TPI(j - 2, j)
            take_skip = skip > best
            best = jnp.where(take_skip, skip, best)
            tfv = jnp.where(take_skip, tf_ref[j - 2], tfv)
            cxv = jnp.where(take_skip, cx_ref[j - 2], cxv)
            if has_var:
                vrv = jnp.where(take_skip, var_ref[j - 2:j - 1, :], vrv)
        newS[j], newTF[j], newCX[j] = best, tfv, cxv
        if has_var:
            newVR[j] = vrv                       # [D?, W] bcastable
    newS[0] = s_in[0] + TPI(0, 0)
    newTF[0], newCX[0] = tf_ref[0], cx_ref[0]

    # --- intra-word shift merge into state 0 --------------------------
    zrow = jnp.full_like(out[0:1], neg)
    sh = jnp.concatenate([zrow, out[:-1]], axis=0) + pip
    sh = jnp.where(fm, neg, sh)
    shTF = jnp.concatenate([otf[0:1], otf[:-1]], axis=0)
    shCX = jnp.concatenate([ocx[0:1], ocx[:-1]], axis=0)
    win = sh > newS[0]
    newS[0] = jnp.where(win, sh, newS[0])
    newTF[0] = jnp.where(win, shTF, newTF[0])
    newCX[0] = jnp.where(win, shCX, newCX[0])

    for j in range(NST):
        os_ref[j] = newS[j]
        otf_ref[j] = newTF[j]
        ocx_ref[j] = newCX[j]
        if has_var and j > 0:
            # VAR carries per word: propagated value at the first row
            vb = jnp.broadcast_to(newVR[j], fm.shape)
            ovar_ref[j:j + 1, :] = jnp.sum(
                jnp.where(fm, vb, 0), axis=0, keepdims=True)
        else:
            ovar_ref[j:j + 1, :] = var_ref[j:j + 1, :] if has_var \
                else jnp.zeros_like(var_ref[j:j + 1, :])

    # --- exit row (depth D-1) for finals/word transitions -------------
    es_ref[0:1, :] = out[D - 1:D]
    etf_ref[0:1, :] = otf[D - 1:D]
    ecx_ref[0:1, :] = ocx[D - 1:D]


def chain_step(S, TF, CTX, VAR, pre, prevd, tp, fm, nv, pip,
               interpret=False):
    """Fused chain-bucket step.

    S/TF/CTX: [NST, D, W] f32/i32/i32; VAR: [NST, W] i32 or None;
    pre: [NST, D, W] f32 senone costs; prevd: [NST, RF, W] f32 variant
    costs or None; tp: [NST*(NST+1), D, W] f32; fm: [D, W] first-node
    mask; nv: [W] i32 variant counts; pip: scalar float.

    Returns (newS, newTF, newCTX, newVAR [NST, W],
             exit_score [W], exit_tf [W], exit_ctx [W])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NST, D, W = S.shape
    has_var = VAR is not None
    RF = prevd.shape[1] if has_var else 1
    TILE = min(512, max(128, 1 << max(W - 1, 1).bit_length()))
    Wp = -(-W // TILE) * TILE

    def padw(x, fill=0):
        if x.shape[-1] == Wp:
            return x
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, Wp - x.shape[-1])]
        return jnp.pad(x, cfg, constant_values=fill)

    Sp = padw(S, NEG_INF)
    TFp, CXp = padw(TF), padw(CTX)
    VARp = padw(VAR) if has_var else jnp.zeros((NST, Wp), jnp.int32)
    prep = padw(pre)
    prevd_p = padw(prevd) if has_var \
        else jnp.zeros((NST, RF, Wp), jnp.float32)
    tpp = padw(tp, NEG_INF)
    fmp = padw(fm.astype(jnp.int8))
    nvp = padw(nv.astype(jnp.int32)[None, :], 1)
    pip_arr = jnp.full((1, 1), pip, jnp.float32)

    grid = (Wp // TILE,)

    def bs(prefix):
        n = len(prefix)
        return pl.BlockSpec(prefix + (TILE,),
                            lambda i, n=n: (0,) * n + (i,),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, NST=NST, D=D, RF=RF,
                             has_var=has_var)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bs((1,)),                                       # nv
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # pip
            bs((NST, D)), bs((NST, D)), bs((NST, D)),       # S TF CTX
            bs((NST,)),                                     # VAR
            bs((NST, D)),                                   # pre
            bs((NST, RF)),                                  # prevd
            bs((NST * (NST + 1), D)),                       # tp
            bs((D,)),                                       # fm
        ],
        out_specs=[bs((NST, D)), bs((NST, D)), bs((NST, D)),
                   bs((NST,)), bs((1,)), bs((1,)), bs((1,))],
        out_shape=[
            jax.ShapeDtypeStruct((NST, D, Wp), jnp.float32),
            jax.ShapeDtypeStruct((NST, D, Wp), jnp.int32),
            jax.ShapeDtypeStruct((NST, D, Wp), jnp.int32),
            jax.ShapeDtypeStruct((NST, Wp), jnp.int32),
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((1, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(nvp, pip_arr, Sp, TFp, CXp, VARp, prep, prevd_p, tpp, fmp)
    nS, nTF, nCX, nVR, eS, eTF, eCX = outs
    cut = lambda x: x[..., :W]
    return (cut(nS), cut(nTF), cut(nCX), cut(nVR),
            cut(eS)[0], cut(eTF)[0], cut(eCX)[0])
