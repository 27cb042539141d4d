"""Pallas TPU kernel: fused word-final right-context fan step.

The fused n-gram decoder's finals block (search/ngram_fused.py step,
"finals fan") is the single largest per-step cost at large vocabulary:
[3, n_rc, W] state/metadata planes (41 x 20k at the 20k-word config)
through a diphone->word senone expansion einsum, a 3-state Viterbi
update with TF/CTX token metadata, the chain-exit entry merge, and the
per-word argmax-over-rc exit reduction.  As XLA kernels that is one
MXU bf16x6 expansion (0.9 ms/step) plus several full read+write
elementwise passes over the planes (round-5 xprof).

This kernel fuses the whole block into ONE pass per [3, n_rc, W_TILE]
tile:

  * the diphone->word expansion never touches HBM: the per-final-
    diphone cost planes (~[3, 41, 640] f32, VMEM-resident per batch
    element) are expanded by an in-kernel one-hot matmul, split into
    three bf16 passes that reconstruct the f32 senone costs EXACTLY
    (the one-hot operand is 0/1, exact in bf16; the cost operand is
    split a = a1+a2+a3 with each part bf16-exact, so the three
    accumulated products sum to the exact f32 value);
  * the 3-state Viterbi update + metadata selects + entry merge +
    exit extraction run in-register on the tile (hmm_step_sm
    semantics, ops/hmm.py; src/hmm.c hmm_vit_eval tie rules);
  * the per-word exit (first-maximal rc, argmax_payload semantics)
    reduces in-block.

Batch folds into the grid's leading dimension via custom_vmap (the
pallas-chain lesson: never let jax.vmap wrap a pallas_call).
Exactness is asserted against the jnp formulation in
tests/test_pallas_fan.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

NEG_INF = -1e30


def _kernel(s_ref, tf_ref, cx_ref, pred_ref, ptf_ref, pcx_ref,
            pre_ref, lp_ref, tp_ref,
            ns_ref, ntf_ref, ncx_ref, of_ref, es_ref, etf_ref, ecx_ref,
            *, NRC, LP):
    """One [3, NRC, T] tile of the fan for one batch element.

    s/tf/cx: [1, 3, NRC, T]; pred/ptf/pcx: [1, T] (chain-last exits,
    pip already applied); pre: [1, 3, NRC, LP] per-diphone senone
    costs; lp: [1, T] final-diphone index per word; tp: [12, T]
    transition goodness rows (j*4+k = tp[j -> k])."""
    import jax
    import jax.numpy as jnp

    T = lp_ref.shape[-1]
    # ---- exact one-hot expansion on the MXU (3 bf16 passes) ----------
    a = -pre_ref[0].reshape(3 * NRC, LP)             # senone goodness
    oh = (jax.lax.broadcasted_iota(jnp.int32, (LP, T), 0)
          == lp_ref[0, 0:1, :]).astype(jnp.bfloat16)
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    sen = (jnp.dot(a1, oh, preferred_element_type=jnp.float32)
           + jnp.dot(a2, oh, preferred_element_type=jnp.float32)
           + jnp.dot(a3, oh, preferred_element_type=jnp.float32))
    sen = sen.reshape(3, NRC, T)

    tp01 = tp_ref[1:2, :]            # tp[0 -> 1]
    tp02 = tp_ref[2:3, :]
    tp12 = tp_ref[6:7, :]
    tp13 = tp_ref[7:8, :]
    tp00 = tp_ref[0:1, :]
    tp11 = tp_ref[5:6, :]
    tp22 = tp_ref[10:11, :]
    tp23 = tp_ref[11:12, :]

    s0 = s_ref[0, 0] + sen[0]
    s1 = s_ref[0, 1] + sen[1]
    s2 = s_ref[0, 2] + sen[2]
    m0tf, m1tf, m2tf = tf_ref[0, 0], tf_ref[0, 1], tf_ref[0, 2]
    m0cx, m1cx, m2cx = cx_ref[0, 0], cx_ref[0, 1], cx_ref[0, 2]

    # ---- non-emitting exit from pre-update values (priority 1 > 2) ---
    lo = s1 + tp13
    hi = s2 + tp23
    hi_wins = hi > lo
    out = jnp.where(hi_wins, hi, lo)                 # [NRC, T]
    otf = jnp.where(hi_wins, m2tf, m1tf)
    ocx = jnp.where(hi_wins, m2cx, m1cx)

    # ---- state updates (hmm_step_sm order: j = 2, 1, 0) --------------
    prev2 = s1 + tp12
    self2 = s2 + tp22
    skip2 = s0 + tp02
    best2 = jnp.maximum(prev2, self2)
    take_self2 = self2 > prev2
    take_skip2 = skip2 > best2
    n2 = jnp.where(take_skip2, skip2, best2)
    n2tf = jnp.where(take_skip2, m0tf, jnp.where(take_self2, m2tf, m1tf))
    n2cx = jnp.where(take_skip2, m0cx, jnp.where(take_self2, m2cx, m1cx))

    prev1 = s0 + tp01
    self1 = s1 + tp11
    n1 = jnp.maximum(prev1, self1)
    take_self1 = self1 > prev1
    n1tf = jnp.where(take_self1, m1tf, m0tf)
    n1cx = jnp.where(take_self1, m1cx, m0cx)

    n0 = s0 + tp00

    # ---- chain-last entry merge on state 0 (strict >) ----------------
    pred = pred_ref[0, 0:1, :]
    win = pred > n0
    n0 = jnp.where(win, pred, n0)
    n0tf = jnp.where(win, ptf_ref[0, 0:1, :], m0tf)
    n0cx = jnp.where(win, pcx_ref[0, 0:1, :], m0cx)

    ns_ref[0, 0], ns_ref[0, 1], ns_ref[0, 2] = n0, n1, n2
    ntf_ref[0, 0], ntf_ref[0, 1], ntf_ref[0, 2] = n0tf, n1tf, n2tf
    ncx_ref[0, 0], ncx_ref[0, 1], ncx_ref[0, 2] = n0cx, n1cx, n2cx
    of_ref[0] = out

    # ---- per-word exit: first-maximal rc + payload select ------------
    esc = jnp.max(out, axis=0, keepdims=True)        # [1, T]
    am = jnp.argmax(out, axis=0)                     # first max
    sel = jax.lax.broadcasted_iota(jnp.int32, (NRC, T), 0) == am[None, :]
    es_ref[0, 0:1, :] = esc
    etf_ref[0, 0:1, :] = jnp.sum(jnp.where(sel, otf, 0), axis=0,
                                 keepdims=True)
    ecx_ref[0, 0:1, :] = jnp.sum(jnp.where(sel, ocx, 0), axis=0,
                                 keepdims=True)


def _fan_call(S, TF, CX, pred, ptf, pcx, pre, lp, tp, n_real,
              keep_padded, interpret, tile=1024):
    """Batched pallas_call.  S/TF/CX [B, 3, NRC, W] (W may be
    pre-padded to the tile size; n_real = true word count for the exit
    outputs); pred/ptf/pcx [B, n_real]; pre [B, 3, NRC, LP];
    lp [n_real]; tp [12, n_real]."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, _, NRC, W = S.shape
    LP = pre.shape[-1]
    LPp = -(-LP // 128) * 128
    TILE = min(tile, max(128, 1 << max(W - 1, 1).bit_length()))
    Wp = -(-W // TILE) * TILE

    def padw(x, fill=0):
        if x.shape[-1] == Wp:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[-1] = (0, Wp - x.shape[-1])
        return jnp.pad(x, cfg, constant_values=fill)

    # S/TF/CX should arrive pre-padded to a TILE multiple (the fused
    # decoder keeps the fan carry padded): per-step pad+slice of the
    # carry planes costs ~0.7 ms/step at 20k words (round-5 xprof)
    Sp = padw(S, NEG_INF)
    TFp, CXp = padw(TF), padw(CX)
    # per-word vectors carry an explicit singleton middle axis so the
    # block's last-two dims are (full, TILE) — the TPU lowering
    # requires second-to-minor block dims divisible by 8 or full
    predp = padw(pred, NEG_INF)[:, None, :]
    ptfp, pcxp = padw(ptf)[:, None, :], padw(pcx)[:, None, :]
    prep = pre if LP == LPp else jnp.pad(
        pre, [(0, 0)] * 3 + [(0, LPp - LP)])
    lpp = padw(lp.astype(jnp.int32)[None, None, :])
    tpp = padw(tp, NEG_INF)

    grid = (B, Wp // TILE)

    def bsb(prefix):
        n = len(prefix)
        return pl.BlockSpec((1,) + prefix + (TILE,),
                            lambda b, i, n=n: (b,) + (0,) * n + (i,),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, NRC=NRC, LP=LPp)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            bsb((3, NRC)), bsb((3, NRC)), bsb((3, NRC)),   # S TF CX
            bsb((1,)), bsb((1,)), bsb((1,)),               # pred ptf pcx
            pl.BlockSpec((1, 3, NRC, LPp),
                         lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),         # pre
            pl.BlockSpec((1, 1, TILE), lambda b, i: (0, 0, i),
                         memory_space=pltpu.VMEM),         # lp
            pl.BlockSpec((12, TILE), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),         # tp
        ],
        out_specs=[bsb((3, NRC)), bsb((3, NRC)), bsb((3, NRC)),
                   bsb((NRC,)), bsb((1,)), bsb((1,)), bsb((1,))],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3, NRC, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, NRC, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, 3, NRC, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, NRC, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, Wp), jnp.int32),
        ],
        interpret=interpret,
        # NOTE: input_output_aliases={0:0, 1:1, 2:2} would save the
        # ~0.35 ms/step of carry copies XLA inserts around the kernel,
        # and works at B=1 — but under the batched (custom_vmap) path
        # inside the B=8 corpus scan it reproducibly crashed the TPU
        # worker ("kernel fault").  Left off until the Mosaic aliasing
        # interaction is understood.
    )(Sp, TFp, CXp, predp, ptfp, pcxp, prep, lpp, tpp)
    nS, nTF, nCX, oF, eS, eTF, eCX = outs
    # with keep_padded the carry planes round-trip at the padded width
    # (no per-step pad+slice, ~0.7 ms/step at 20k); exit reductions are
    # always cut to the true word count
    cut = lambda x: x[..., :n_real]
    if not keep_padded:
        nS, nTF, nCX = cut(nS), cut(nTF), cut(nCX)
    return (nS, nTF, nCX, cut(oF),
            cut(eS)[:, 0], cut(eTF)[:, 0], cut(eCX)[:, 0])


@functools.lru_cache(maxsize=None)
def _fan_op(interpret, n_real, keep_padded):
    """custom_vmap wrapper: under jax.vmap the batch axis becomes the
    pallas grid's leading dimension, not a serial outer loop."""
    import jax
    import jax.numpy as jnp

    @jax.custom_batching.custom_vmap
    def op(S, TF, CX, pred, ptf, pcx, pre, lp, tp):
        outs = _fan_call(S[None], TF[None], CX[None], pred[None],
                         ptf[None], pcx[None], pre[None], lp, tp,
                         n_real, keep_padded, interpret)
        return tuple(o[0] for o in outs)

    @op.def_vmap
    def _op_vmap(axis_size, in_batched, S, TF, CX, pred, ptf, pcx,
                 pre, lp, tp):
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        outs = _fan_call(
            ensure(S, in_batched[0]), ensure(TF, in_batched[1]),
            ensure(CX, in_batched[2]), ensure(pred, in_batched[3]),
            ensure(ptf, in_batched[4]), ensure(pcx, in_batched[5]),
            ensure(pre, in_batched[6]), lp, tp, n_real, keep_padded,
            interpret)
        return tuple(outs), tuple([True] * 7)

    return op


def fan_step(S, TF, CX, pred, ptf, pcx, pre, lp, tp, n_real=None,
             interpret=False):
    """Fused finals-fan step (vmap-aware; see module docstring).

    S/TF/CX: [3, NRC, W] f32/i32/i32 stacked state planes;
    pred/ptf/pcx: [W] chain-last exits (pip applied) + metadata;
    pre: [3, NRC, LP] f32 per-final-diphone senone costs;
    lp: [W] i32 final-diphone index; tp: [12, W] f32 transition rows.

    n_real: true word count when the S/TF/CX planes are pre-padded
    to the pallas tile width — the carry outputs then stay padded and
    only the exit outputs are cut to n_real.

    Returns (newS, newTF, newCX [3, NRC, W], out_f [NRC, n_real],
             esc/etf/ecx [n_real])."""
    keep_padded = n_real is not None
    nr = int(n_real) if keep_padded else int(S.shape[-1])
    op = _fan_op(bool(interpret), nr, keep_padded)
    return op(S, TF, CX, pred, ptf, pcx, pre, lp, tp)
