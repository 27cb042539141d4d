"""Acoustic model bundle: mdef + tmat + Gaussians + mixture weights as
device arrays, with batched TPU senone scoring.

Replaces the reference's acmod_t + ps_mgaufuncs_t scorer stack
(src/acmod.c, src/ptm_mgau.c, src/ms_mgau.c, src/s2_semi_mgau.c) with a
dense batched design: instead of active-senone lists and per-codebook
top-N shortlists, every senone is scored every frame as a fused
matmul + logsumexp — the TPU idiom (SURVEY.md §2.2).

Score units: float32 "shifted logmath units" == the reference's int16
senone-score scale (log base 1.0001, >> SENSCR_SHIFT).  0 = per-frame
best, larger = worse (cost).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import cached_property

import numpy as np

from ..fileio import (read_bin_mdef, read_gauden, read_sendump,
                      read_mixw_quantized, read_tmat, BinMdef, Gauden,
                      MixtureWeights, Tmat)
from ..logmath import SENSCR_SHIFT

LN_BASE = math.log(1.0001)
# one shifted score unit, in nats
UNIT_NATS = LN_BASE * (1 << SENSCR_SHIFT)


@dataclass
class AcousticModel:
    """Loaded acoustic model with precomputed device-ready arrays."""

    mdef: BinMdef
    gauden: Gauden
    mixw: MixtureWeights
    tmat: Tmat
    model_type: str  # "ptm" | "cont" | "semi"

    @classmethod
    def load(cls, hmm_dir: str, varfloor: float = 1e-4,
             mixwfloor: float = 1e-7, tmatfloor: float = 1e-4,
             sendump: str | None = None) -> "AcousticModel":
        """Load from a model directory (mdef/means/variances/
        transition_matrices + sendump or mixture_weights)."""
        p = lambda f: os.path.join(hmm_dir, f)
        mdef = read_bin_mdef(p("mdef"))
        g = read_gauden(p("means"), p("variances"), varfloor)
        # Model type selection mirrors acmod_init_am (src/acmod.c:62-170):
        # one codebook per CI phone => PTM; one codebook total => semi;
        # one codebook per senone => fully continuous.
        if g.n_mgau == mdef.n_ciphone:
            mtype = "ptm"
        elif g.n_mgau == 1:
            mtype = "semi"
        else:
            mtype = "cont"
        if sendump is None and os.path.isfile(p("sendump")):
            sendump = p("sendump")
        if sendump:
            # 4-bit cluster nibble unpacking differs between the PTM and
            # semi scorers (see read_sendump docstring).
            mixw = read_sendump(sendump, mdef.n_sen, g.n_feat, g.n_density,
                                nibble_mode=("senone" if mtype == "semi"
                                             else "byte"))
        else:
            mixw = read_mixw_quantized(p("mixture_weights"), mixwfloor)
        tmat = read_tmat(p("transition_matrices"), tmatfloor)
        return cls(mdef=mdef, gauden=g, mixw=mixw, tmat=tmat,
                   model_type=mtype)

    # -- derived arrays ------------------------------------------------------

    @cached_property
    def sen2cb(self) -> np.ndarray:
        """Senone -> codebook map [n_sen]."""
        if self.model_type == "ptm":
            return self.mdef.sen2cimap.astype(np.int32)
        if self.model_type == "semi":
            return np.zeros(self.mdef.n_sen, dtype=np.int32)
        return np.arange(self.mdef.n_sen, dtype=np.int32)

    @cached_property
    def n_sen(self) -> int:
        return self.mdef.n_sen

    @cached_property
    def scoring_arrays(self) -> dict:
        """Precompute the dense scoring operands (host numpy; moved to
        device by jnp.asarray on first use).

        The density exponent  det - sum_i (x_i - mu_i)^2 * prec_i
        is decomposed for the MXU as
            const[cb,f,d] - (x2 . prec - 2 x . muprec)
        with const = det - sum mu^2 prec.
        """
        g = self.gauden
        prec = g.prec.astype(np.float64)          # int values
        mu = g.means.astype(np.float64)
        muprec = mu * prec
        const = g.det.astype(np.float64) - (mu * muprec).sum(-1)
        # scale everything into *shifted* units now so scoring works
        # directly on the reference senone-score scale
        s = 1.0 / (1 << SENSCR_SHIFT)
        return {
            "prec": (prec * s).astype(np.float32),      # [CB,F,D,L]
            "muprec": (muprec * s).astype(np.float32),  # [CB,F,D,L]
            "const": (const * s).astype(np.float32),    # [CB,F,D]
            # linear-domain mixture weights for the LSE matmul:
            # w = exp(-mixw_cost * UNIT_NATS)
            "w_lin": np.exp(-self.mixw.mixw.astype(np.float64)
                            * UNIT_NATS).astype(np.float32),  # [F,D,S]
            "mixw_cost": self.mixw.mixw.astype(np.float32),   # [F,D,S]
            "sen2cb": self.sen2cb,
        }

    # -- senone groups by codebook (for block-diagonal scoring) -------------

    @cached_property
    def cb_groups(self) -> dict:
        """Senones grouped by codebook, padded to a uniform size:
        sen_pad [CB, Smax] senone ids (fill = 0 masked), mask [CB, Smax]."""
        cb = self.sen2cb
        n_cb = self.gauden.n_mgau
        groups = [np.nonzero(cb == c)[0] for c in range(n_cb)]
        smax = max(len(gr) for gr in groups)
        # round up to lane multiple for clean TPU layout
        smax = (smax + 127) & ~127
        sen_pad = np.zeros((n_cb, smax), dtype=np.int32)
        mask = np.zeros((n_cb, smax), dtype=bool)
        for c, gr in enumerate(groups):
            sen_pad[c, :len(gr)] = gr
            mask[c, :len(gr)] = True
        return {"sen_pad": sen_pad, "mask": mask, "smax": smax}


def senone_scores_jax(model_arrays: dict, cb_groups: dict, feats,
                      topn: int = 4, time_chunk: int | None = None,
                      ds: int = 1):
    """Batched senone scoring: feats [B, T, F, L] float32 ->
    costs [B, T, n_sen] float32 (shifted units, 0 = per-frame best).

    ds > 1: frame GMM downsampling (the reference's -ds speed knob,
    src/ptm_mgau.c:241-243 "if (frame % s->ds_ratio) return"): only
    every ds-th frame is scored and its scores are held for the
    following ds-1 frames.  On TPU this divides the scoring matmul
    FLOPs by ds.

    time_chunk: process T in chunks of this many frames (lax.map) to
    bound the [B, chunk, CB, F, Smax] mixture intermediate — required
    for large batches (it grows ~1 MB per frame per utterance on en-us).

    topn > 0 (default 4): reference-style per-(codebook, stream) top-N
    density shortlist, realized as a mask on the dense matmul — closest
    to the reference int pipeline (|err| ~1 unit on well-scored senones).
    topn == 0: exact log-sum-exp over all densities (mathematically exact
    GMM likelihood; deviates from the reference's truncated sum).

    Both modes share one MXU-shaped computation: two [BT*F, L] x
    [L, CB*D] matmuls for the quadratic form, then a block-diagonal
    [CB, F, D] x [CB, F, D, Smax] matmul in the linear domain for the
    mixture sum.  All matmuls run with HIGHEST precision: senone scores
    feed beam comparisons, where bf16 noise would flip pruning decisions.
    """
    import jax
    import jax.numpy as jnp

    if ds > 1:
        feats = jnp.asarray(feats)
        T = feats.shape[1]
        out = senone_scores_jax(model_arrays, cb_groups,
                                feats[:, ::ds], topn=topn,
                                time_chunk=time_chunk)
        return jnp.repeat(out, ds, axis=1)[:, :T]

    if time_chunk:
        feats = jnp.asarray(feats)
        B, T = feats.shape[:2]
        n_chunks = -(-T // time_chunk)
        pad = n_chunks * time_chunk - T
        fpad = jnp.pad(feats, ((0, 0), (0, pad), (0, 0), (0, 0)))
        chunks = fpad.reshape(B, n_chunks, time_chunk,
                              *feats.shape[2:]).swapaxes(0, 1)
        out = jax.lax.map(
            lambda fc: senone_scores_jax(model_arrays, cb_groups, fc,
                                         topn=topn), chunks)
        out = out.swapaxes(0, 1).reshape(B, n_chunks * time_chunk, -1)
        return out[:, :T]

    import os
    # scores feed Viterbi compares; HIGHEST (bf16x6 ~ f32) is the
    # bit-stable default.  PS_SCORE_PRECISION=high opts into bf16x3
    # (half the MXU passes, ~2^-22 relative score noise) for
    # throughput-over-exactness deployments.
    hp = (jax.lax.Precision.HIGH
          if os.environ.get("PS_SCORE_PRECISION", "").lower() == "high"
          else jax.lax.Precision.HIGHEST)
    prec = jnp.asarray(model_arrays["prec"])        # [CB,F,D,L]
    muprec = jnp.asarray(model_arrays["muprec"])
    const = jnp.asarray(model_arrays["const"])      # [CB,F,D]
    CB, F, D, L = prec.shape

    x = jnp.asarray(feats)                          # [B,T,F,L]
    B, T = x.shape[:2]
    x2 = x * x
    # dens[b,t,cb,f,d] = const - (x2.prec - 2 x.muprec)
    quad = jnp.einsum("btfl,cfdl->btcfd", x2, prec, precision=hp)
    cross = jnp.einsum("btfl,cfdl->btcfd", x, muprec, precision=hp)
    dens = const[None, None] - quad + 2.0 * cross   # [B,T,CB,F,D]

    # per-stream normalization (reference norm: best over codebooks),
    # then clamp at -MAX_NEG_ASCR like ptm_mgau_codebook_norm
    norm = dens.max(axis=(2, 4), keepdims=True)     # [B,T,1,F,1]
    dnorm = jnp.maximum(dens - norm, -96.0)         # <= 0

    E = jnp.exp(dnorm * UNIT_NATS)                  # [B,T,CB,F,D]
    if topn and topn < D:
        kth = jax.lax.top_k(dnorm, topn)[0][..., -1:]   # [B,T,CB,F,1]
        E = jnp.where(dnorm >= kth, E, 0.0)
    w_lin = jnp.asarray(model_arrays["w_lin"])      # [F,D,S]
    S = w_lin.shape[-1]
    if CB == S:
        # Fully-continuous model (one codebook per senone): the mixture
        # sum is diagonal in the codebook axis — one fused einsum.
        P_diag = jnp.einsum("btcfd,fdc->btcf", E, w_lin, precision=hp)
        fden = jnp.log(jnp.maximum(P_diag, 1e-37)) / UNIT_NATS
        goodness = fden.sum(axis=-1)                # [B,T,S]
        return goodness.max(axis=-1, keepdims=True) - goodness
    # Block-diagonal mixture matmul over codebook groups:
    # Wg[cb,f,d,s] = w_lin[f,d,sen_pad[cb,s]]
    sen_pad = jnp.asarray(cb_groups["sen_pad"])     # [CB,Smax]
    mask = jnp.asarray(cb_groups["mask"])
    Wg = w_lin[:, :, sen_pad].transpose(2, 0, 1, 3)     # [CB,F,D,Smax]
    P = jnp.einsum("btcfd,cfds->btcfs", E, Wg, precision=hp)
    fden = jnp.log(jnp.maximum(P, 1e-37)) / UNIT_NATS   # [B,T,CB,F,Smax]
    grouped = fden.sum(axis=3)                      # [B,T,CB,Smax]
    # scatter back to senone order; padded slots target index S and are
    # dropped (each real senone appears exactly once)
    S = w_lin.shape[-1]
    flat_ids = jnp.where(mask, sen_pad, S).reshape(-1)
    flat = grouped.reshape(B, T, -1)
    goodness = jnp.full((B, T, S), -jnp.inf, flat.dtype).at[
        :, :, flat_ids].set(flat, mode="drop")
    # cost convention: 0 = per-frame best, larger = worse
    return goodness.max(axis=-1, keepdims=True) - goodness
