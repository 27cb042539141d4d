"""Worker process for the 2-process multi-host test
(tests/test_multihost.py).  Runs the real multi-process path of
pocketsphinx_tpu.parallel.batch: jax.distributed init, per-process ctl
sharding, local-mesh batch decode, cross-process metric reduction.

argv: pid nproc port outfile
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

REFERENCE = os.environ.get("PS_REFERENCE", "/root/reference")


def main():
    pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    from pocketsphinx_tpu.parallel.batch import (
        init_distributed, shard_ctl, global_metric_sum,
        BatchDecodePipeline)

    my_pid, n = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert (my_pid, n) == (pid, nproc), (my_pid, n)

    import jax
    local_cpus = jax.local_devices(backend="cpu")
    jax.config.update("jax_default_device", local_cpus[0])

    from jax.sharding import Mesh
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.models.dict2pid import Dict2Pid
    from pocketsphinx_tpu.fileio.dictionary import Dictionary
    from pocketsphinx_tpu.lm.ngram import read_lm
    from pocketsphinx_tpu.search.ngram_fused import NgramFusedDecoder
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend

    model_dir = os.path.join(REFERENCE, "model/en-us/en-us")
    data = os.path.join(REFERENCE, "test/data")
    am = AcousticModel.load(model_dir)
    d = Dictionary(am.mdef, os.path.join(data, "turtle.dic"),
                   os.path.join(model_dir, "noisedict"))
    dec = NgramFusedDecoder(
        am, Dict2Pid(am.mdef, d),
        read_lm(os.path.join(data, "turtle.lm.bin"), lw=6.5, wip=0.65))

    pcm = np.frombuffer(
        open(os.path.join(data, "goforward.raw"), "rb").read(), "<i2")
    corpus = [pcm, pcm[:40000], pcm[:32000], pcm[8000:]]

    # per-process ctl shard over a local 2-device data mesh
    ctl = shard_ctl(list(range(len(corpus))), pid, nproc)
    mesh = Mesh(np.array(local_cpus[:2]).reshape(2, 1), ("data", "model"))
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                 lifter_val=22, remove_noise=True)  # en-us feat.params
    pipe = BatchDecodePipeline(dec, fe, mesh=mesh)
    results = pipe.decode_corpus([corpus[i].astype(np.float32)
                                  for i in ctl], batch_size=2)
    hyps = {str(i): r[0] for i, r in zip(ctl, results)}

    n_frames = sum(fe.n_frames(len(corpus[i])) for i in ctl)
    totals = global_metric_sum([float(len(ctl)), float(n_frames)])

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "hyps": hyps,
                   "totals": [float(t) for t in totals]}, f)


if __name__ == "__main__":
    main()
