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
