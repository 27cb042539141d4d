"""Multi-chip batch decoding: DP/TP-sharded corpus pipeline.

The scale-out design of SURVEY.md §2.3 / §5.8: the reference has no
parallelism (its "scale" is running many processes over a -ctl split);
here the utterance batch axis shards across a `jax.sharding.Mesh` "data"
axis (DP — decoding is embarrassingly parallel over utterances), the
senone/mixture tables shard across "model" (TP — for acoustic models
that exceed one chip), and XLA inserts the collectives.  Within-utterance
time stays a `lax.scan` (the sequence-parallel analog for a sequential
Viterbi recurrence); corpus metrics reduce with `psum`-style means.

Multi-host: initialize the JAX distributed runtime
(`jax.distributed.initialize`) before building the mesh, shard the
control file by `jax.process_index()`, and the same code runs across
hosts — collectives ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_data: int | None = None, n_model: int = 1):
    """Build a ("data", "model") mesh over the available devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    devs = np.array(devs[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


class BatchDecodePipeline:
    """Sharded corpus decoding over a device mesh.

    Wraps a search with `decode_batch` (NgramFlatDecoder) plus the
    frontend, placing per-batch inputs with a data-axis sharding so each
    chip decodes its shard of padded utterances.
    """

    def __init__(self, decoder_search, frontend, mesh=None,
                 feat_type: str = "1s_c_d_dd",
                 svspec: str | None = "0-12/13-25/26-38",
                 cmn: str = "batch"):
        import jax
        self.search = decoder_search
        self.fe = frontend
        self.mesh = mesh or make_mesh()
        self.feat_type = feat_type
        self.svspec = svspec
        self.cmn = cmn

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    def decode_corpus(self, pcm_list: list[np.ndarray],
                      batch_size: int | None = None):
        """Decode a list of PCM utterances; returns [(hyp, segs)].

        Utterances are length-bucketed, padded to the bucket max, and
        each device batch is sharded over the mesh's data axis.
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..models.acoustic import senone_scores_jax
        from ..frontend.feat import compute_feats_jax

        dp = self.data_parallelism
        tp = self.mesh.shape.get("model", 1)
        B = batch_size or max(dp, 8 * dp)
        B = (B // dp) * dp or dp
        order = sorted(range(len(pcm_list)), key=lambda i: len(pcm_list[i]))
        results: list = [None] * len(pcm_list)
        sharding = NamedSharding(self.mesh, P("data"))

        scan = self.search._make_scan()
        arrays = dict(self.search.am.scoring_arrays)
        groups = self.search.am.cb_groups
        fe = self.fe
        if tp > 1:
            # TP: shard the mixture-weight table on the senone axis; the
            # per-frame senone cost vector is gathered back to "data"-only
            # sharding by the constraint below (XLA all-gather over ICI)
            pad = (-arrays["w_lin"].shape[-1]) % tp
            if pad:
                arrays["w_lin"] = np.pad(arrays["w_lin"],
                                         [(0, 0)] * (arrays["w_lin"].ndim - 1)
                                         + [(0, pad)])
            arrays["w_lin"] = jax.device_put(
                arrays["w_lin"],
                NamedSharding(self.mesh,
                              P(*([None] * (arrays["w_lin"].ndim - 1)
                                  + ["model"]))))
        cost_spec = NamedSharding(self.mesh, P("data", None, None))
        n_sen = self.search.am.scoring_arrays["w_lin"].shape[-1]

        @jax.jit
        def run(pcm_batch, n_samps):
            cep, nfr = fe.process_batch_jax(pcm_batch, n_samps)
            feats = compute_feats_jax(cep, nfr, cmn=self.cmn)
            costs = senone_scores_jax(arrays, groups, feats)[..., :n_sen]
            costs = jax.lax.with_sharding_constraint(costs, cost_spec)
            T = costs.shape[1]
            valid = jnp.arange(T)[None, :] < nfr[:, None]
            recs = jax.vmap(scan)(costs, valid)
            return recs, nfr

        with self.mesh:
            for i0 in range(0, len(order), B):
                idx = order[i0:i0 + B]
                pad_idx = idx + [idx[-1]] * (B - len(idx))  # fill batch
                maxlen = max(len(pcm_list[i]) for i in pad_idx)
                batch = np.zeros((B, maxlen), np.float32)
                ns = np.zeros(B, np.int32)
                for k, i in enumerate(pad_idx):
                    batch[k, :len(pcm_list[i])] = pcm_list[i]
                    ns[k] = len(pcm_list[i])
                batch = jax.device_put(batch, sharding)
                ns_dev = jax.device_put(ns, sharding)
                recs, nfr = run(batch, ns_dev)
                recs = tuple(np.asarray(r) for r in recs)
                nfr = np.asarray(nfr)
                for k, i in enumerate(idx):
                    # vmapped records are stacked [B, T, ...]
                    per_utt = tuple(r[k] for r in recs)
                    results[i] = self.search._backtrace(
                        per_utt, int(nfr[k]))
        return results
