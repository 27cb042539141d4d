"""xprof op-profile of the fused scan at a given config.

Runs the scan under jax.profiler.trace and prints the op-profile
category breakdown (docs/PERF_NOTES.md methodology).

Usage: python tools/xprof_scan.py [--config 20k] [--batch 6]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jaxtrace"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="20k")
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--minimal", action="store_true",
                    help="top-K-compressed records (the corpus-bench "
                         "path; full records OOM at B>=12 / 20k)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build
    from pocketsphinx_tpu.frontend.mfcc import MelFrontend
    from pocketsphinx_tpu.frontend.feat import compute_feats
    from pocketsphinx_tpu.models.acoustic import senone_scores_jax

    ref = os.environ.get("PS_REFERENCE", "/root/reference")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fe = MelFrontend(nfilt=25, lowerf=130, upperf=6800, transform="dct",
                     lifter_val=22, remove_noise=True)
    if args.config == "turtle":
        dic = ref + "/test/data/turtle.dic"
        lmf = ref + "/test/data/turtle.lm.bin"
    else:
        dic = os.path.join(here, f"bench_data/bench-{args.config}.dic")
        lmf = os.path.join(here, f"bench_data/bench-{args.config}.lm.bin")
    dec = build(ref, dic, lmf)
    scan = dec._make_scan(minimal=args.minimal)
    print(f"W={dec.W} mode={dec.lm_mode}", flush=True)

    pcm = np.frombuffer(open(ref + "/test/data/goforward.raw", "rb").read(),
                        dtype="<i2")
    feats = compute_feats(fe.process(pcm), cmn="batch")
    B = args.batch
    fb = np.tile(feats[None], (B, 1, 1, 1)).astype(np.float32)
    costs = senone_scores_jax(dec.am.scoring_arrays, dec.am.cb_groups,
                              jnp.asarray(fb), time_chunk=16)
    T = costs.shape[1]
    valid = jnp.ones((B, T), bool)
    vscan = jax.vmap(scan)

    def sync(x):
        jax.tree.map(lambda a: a.block_until_ready(), x)

    raw = vscan(costs, valid)
    sync(raw)
    del raw
    t0 = time.time()
    raw = vscan(costs, valid)
    sync(raw)
    dt = time.time() - t0
    print(f"scan: {dt*1000:.1f} ms = {dt/T*1000:.2f} ms/step "
          f"(B={B}, T={T})", flush=True)
    del raw
    if args.no_trace:
        return

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        raw = vscan(costs, valid)
        sync(raw)
    del raw

    from xprof.convert import raw_to_tool_data as rtd
    paths = glob.glob(TRACE_DIR + "/plugins/profile/*/*.xplane.pb")
    data, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
    prof = json.loads(data)
    node = prof["byProgramExcludeIdle"]
    total_ps = 0
    cats = []
    for cat in node.get("children", []):
        m = cat["metrics"]
        t_ps = int(m.get("rawTime", 0))
        total_ps += t_ps
        cats.append((t_ps, cat["name"], m.get("occurrences", 0),
                     cat.get("children", [])))
    cats.sort(reverse=True)
    print(f"\ntotal profiled: {total_ps/1e12*1000:.1f} ms")
    for t_ps, name, occ, children in cats:
        print(f"{t_ps/1e12*1000:8.2f} ms {100*t_ps/total_ps:5.1f}%  "
              f"x{occ:<6} {name}")
        kids = sorted(children,
                      key=lambda c: -int(c["metrics"].get("rawTime", 0)))
        for c in kids[:6]:
            cm = c["metrics"]
            print(f"     {int(cm.get('rawTime',0))/1e12*1000:8.2f} ms "
                  f"x{cm.get('occurrences',0):<6} {c['name'][:90]}")


if __name__ == "__main__":
    main()
