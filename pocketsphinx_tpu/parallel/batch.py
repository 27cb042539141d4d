"""Multi-chip batch decoding: DP/TP-sharded corpus pipeline.

The scale-out design of SURVEY.md §2.3 / §5.8: the reference has no
parallelism (its "scale" is running many processes over a -ctl split);
here the utterance batch axis shards across a `jax.sharding.Mesh` "data"
axis (DP — decoding is embarrassingly parallel over utterances), the
senone/mixture tables shard across "model" (TP — for acoustic models
that exceed one chip), and XLA inserts the collectives.  Within-utterance
time stays a `lax.scan` (the sequence-parallel analog for a sequential
Viterbi recurrence); corpus metrics reduce with `psum`-style means.

Multi-host: `init_distributed` starts the JAX distributed runtime
(`jax.distributed.initialize`), `shard_ctl` splits the control file by
process index (replacing the reference's operator-driven
process-per-ctl-shard scaling, programs/pocketsphinx_batch.c), each
process decodes its shard over its local mesh, and `global_metric_sum`
reduces corpus metrics (utterance/frame/error counts) across processes
with a replicated-sum collective — ICI within a slice, DCN across
slices.  Exercised by tests/test_multihost.py with two real CPU
processes.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Start the JAX multi-process runtime.  On cloud TPU the arguments
    auto-detect; for manual/CPU jobs pass coordinator ("host:port"),
    process count, and this process's id.  Returns (process_index,
    process_count) as seen by the CPU backend (which is present on
    every host and used for cross-process metric reduction)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return (jax.process_index(backend="cpu"),
            jax.process_count(backend="cpu"))


def shard_ctl(entries: list, process_id: int | None = None,
              process_count: int | None = None) -> list:
    """Shard a -ctl utterance list across processes (strided, so
    length-sorted corpora balance).  Defaults to the live runtime's
    process index/count."""
    import jax
    pid = jax.process_index(backend="cpu") if process_id is None \
        else process_id
    n = jax.process_count(backend="cpu") if process_count is None \
        else process_count
    return entries[pid::n]


def global_metric_sum(local_vector) -> np.ndarray:
    """Sum a per-process float metric vector across all processes.

    Builds a one-device-per-process CPU mesh, assembles the global
    [n_proc, dim] array from each process's addressable shard, and runs
    a jitted sum with replicated output — a real cross-host collective
    (gRPC/DCN on CPU, ICI/DCN on TPU slices).  Single-process: returns
    the input unchanged."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    local = np.asarray(local_vector, np.float32).reshape(1, -1)
    nproc = jax.process_count(backend="cpu")
    if nproc == 1:
        return local[0]
    per_proc = {}
    for d in jax.devices("cpu"):
        per_proc.setdefault(d.process_index, d)
    devs = [per_proc[i] for i in sorted(per_proc)]
    mesh = Mesh(np.array(devs), ("proc",))
    mine = per_proc[jax.process_index(backend="cpu")]
    arr = jax.make_array_from_single_device_arrays(
        (nproc, local.shape[1]), NamedSharding(mesh, P("proc", None)),
        [jax.device_put(local, mine)])
    tot = jax.jit(lambda x: jnp.sum(x, axis=0),
                  out_shardings=NamedSharding(mesh, P()))(arr)
    return np.asarray(tot.addressable_data(0))


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
        if tp > 1 and getattr(self.search, "_dev_tables", None):
            # TP for the tables that actually get big (round-3 review
            # weak #8): the LM row/bigram/context tables are the only
            # GB-scale arrays of the n-gram decoder (dense context rows
            # reach chip HBM at 20k+ words).  Shard their entry-column
            # (E) axis across "model": the per-K dynamic-slice row
            # fetches and the [K, E] candidate/argmax block partition
            # on E (the einsum structure composes), XLA inserting the
            # gather/reduce collectives.  Small metadata tables stay
            # replicated.
            sharded = {}
            for k, v in self.search._dev_tables.items():
                if k in ("rows", "bg", "ctx_next", "fat_rows",
                         "fat_ctx") and v.ndim == 2:
                    spec = P(None, "model")
                elif k in ("uni_row", "ctx_base"):
                    spec = P("model")
                else:
                    spec = P()
                sharded[k] = jax.device_put(
                    np.asarray(v), NamedSharding(self.mesh, spec))
            self.search._dev_tables = sharded
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
            # ...and the Gaussian tables on the codebook axis (SURVEY
            # §2.3 TP row: "Gaussian codebooks shard on the codebook
            # axis"), when it divides evenly (en-us: 42 codebooks)
            if arrays["prec"].shape[0] % tp == 0:
                for k in ("prec", "muprec", "const"):
                    a = arrays[k]
                    arrays[k] = jax.device_put(
                        a, NamedSharding(
                            self.mesh,
                            P(*["model"] + [None] * (a.ndim - 1))))
        cost_spec = NamedSharding(self.mesh, P("data", None, None))
        n_sen = self.search.am.scoring_arrays["w_lin"].shape[-1]

        @jax.jit
        def run_t(pcm_batch, n_samps, tables):
            # decoder tables ride the outer jit as ARGUMENTS (constant
            # capture is a compile-size/time hazard at scale) and keep
            # their mesh shardings
            cep, nfr = fe.process_batch_jax(pcm_batch, n_samps)
            feats = compute_feats_jax(cep, nfr, cmn=self.cmn)
            costs = senone_scores_jax(arrays, groups, feats)[..., :n_sen]
            costs = jax.lax.with_sharding_constraint(costs, cost_spec)
            T = costs.shape[1]
            valid = jnp.arange(T)[None, :] < nfr[:, None]
            if hasattr(scan, "with_tables"):
                recs = jax.vmap(
                    lambda c, v: scan.with_tables(c, v, tables))(
                    costs, valid)
            else:
                recs = jax.vmap(scan)(costs, valid)
            return recs, nfr

        def run(pcm_batch, n_samps):
            return run_t(pcm_batch, n_samps,
                         getattr(self.search, "_dev_tables", None) or {})

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
