"""Dense token-passing HMM update — the hmm_vit_eval equivalent
(src/hmm.c:222-470) for arbitrary leading batch shape and 3- or 5-state
left-to-right (1-skip) topologies.

Semantics replicated exactly:
  * emissions attach to the *source* state (s_i = score_i + sen_i before
    transitions);
  * the non-emitting exit is computed from pre-update values with
    sources (N-2, N-1), tie -> lower state;
  * states update top-down in place, candidate priority on ties:
    from(j-1) > self > skip(j-2);
  * state 0 only self-loops (entries are applied by the caller after the
    step, taking effect next frame, per hmm_enter).

All searches (align / ngram / fsg / kws / allphone) share this op.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e30


def hmm_step(S, sen_t, tp):
    """One frame of Viterbi for [..., N]-state HMMs.

    S     [..., N]      state scores (goodness, bigger better)
    sen_t [..., N]      per-state senone goodness increments (<= 0)
    tp    [..., N, N+1] transition goodness (-cost; NEG_INF = impossible)

    Returns (newS [...,N], src [...,N] int32 source-state per target,
             out [...], out_src [...] int32).
    """
    import jax.numpy as jnp

    N = S.shape[-1]
    s = S + sen_t
    # exit: sources N-2 (priority) then N-1
    cand_out = jnp.stack([s[..., N - 2] + tp[..., N - 2, N],
                          s[..., N - 1] + tp[..., N - 1, N]], axis=-1)
    oc = jnp.argmax(cand_out, axis=-1)
    out = jnp.max(cand_out, axis=-1)
    out_src = (N - 2 + oc).astype(jnp.int32)

    new_states = []
    srcs = []
    for j in range(N - 1, 0, -1):
        cands = [s[..., j - 1] + tp[..., j - 1, j],
                 s[..., j] + tp[..., j, j]]
        src_ids = [j - 1, j]
        if j >= 2:
            cands.append(s[..., j - 2] + tp[..., j - 2, j])
            src_ids.append(j - 2)
        c = jnp.stack(cands, axis=-1)
        a = jnp.argmax(c, axis=-1)
        new_states.append(jnp.max(c, axis=-1))
        srcs.append(jnp.asarray(np.array(src_ids, np.int32))[a])
    n0 = s[..., 0] + tp[..., 0, 0]
    new_states.append(n0)
    srcs.append(jnp.zeros_like(out_src))
    newS = jnp.stack(new_states[::-1], axis=-1)
    src = jnp.stack(srcs[::-1], axis=-1)
    return newS, src, out, out_src


def propagate_meta(meta, src):
    """Gather per-state metadata along the chosen sources:
    meta [..., N] -> new meta [..., N]."""
    import jax.numpy as jnp
    return jnp.take_along_axis(meta, src, axis=-1)


def out_meta(meta, out_src):
    """Metadata of the exit's source state: [..., N] -> [...]."""
    import jax.numpy as jnp
    return jnp.take_along_axis(meta, out_src[..., None], axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# State-major variant: TPU-efficient layout
# ---------------------------------------------------------------------------
#
# The [..., N]-trailing layout above puts the tiny state axis on the TPU
# lane dimension, padding N=3 to 128 lanes (~40x wasted VPU work per op in
# the per-frame scan).  The state-major variant keeps every per-state
# plane as its own [...]-shaped array (P on lanes) and replaces gathers
# with where-selects, which is what the hot decoders use.

def hmm_step_sm(S, sen_t, tp, metas=()):
    """State-major Viterbi step.

    S      tuple of N arrays [...]: per-state scores
    sen_t  tuple of N arrays [...]: senone goodness increments
    tp     [..., N, N+1] transition goodness (indexed statically)
    metas  list of tuples-of-N metadata arrays to propagate alongside

    Returns (newS tuple, new_metas list, out, out_sel bool [...]
    (True = exit came from state N-1), out_metas list of [...]).
    Tie semantics identical to hmm_step / hmm_vit_eval.
    """
    import jax.numpy as jnp

    N = len(S)
    s = [S[j] + sen_t[j] for j in range(N)]
    # exit: priority N-2 over N-1 on ties
    lo = s[N - 2] + tp[..., N - 2, N]
    hi = s[N - 1] + tp[..., N - 1, N]
    hi_wins = hi > lo
    out = jnp.where(hi_wins, hi, lo)
    out_metas = [jnp.where(hi_wins, m[N - 1], m[N - 2]) for m in metas]

    newS = [None] * N
    new_metas = [[None] * N for _ in metas]
    for j in range(N - 1, 0, -1):
        prev = s[j - 1] + tp[..., j - 1, j]
        self_ = s[j] + tp[..., j, j]
        # priority: from(j-1) > self > skip(j-2)
        best = jnp.maximum(prev, self_)
        take_self = self_ > prev
        if j >= 2:
            skip = s[j - 2] + tp[..., j - 2, j]
            take_skip = skip > best
            best = jnp.where(take_skip, skip, best)
        newS[j] = best
        for mi, m in enumerate(metas):
            v = jnp.where(take_self, m[j], m[j - 1])
            if j >= 2:
                v = jnp.where(take_skip, m[j - 2], v)
            new_metas[mi][j] = v
    newS[0] = s[0] + tp[..., 0, 0]
    for mi, m in enumerate(metas):
        new_metas[mi][0] = m[0]
    return tuple(newS), [tuple(nm) for nm in new_metas], out, hi_wins, \
        out_metas
