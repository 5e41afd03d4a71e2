"""Cluster aggregation for the 1080p render trace (docs/ROOFLINE_render.md).

Parses the xplane from tools/xla_trace_render.py and buckets op time by the
tensor population each op touches (chunk = 32768 rays at the flagship's
eval_num_rays_per_chunk=32768... the trace shows [32768, S] per-ray shapes,
[1048576]=32k x 32 nerf samples, [4194304]=32k x 128 prop-1 samples,
[1572864]=32k x 48 prop-2 samples). `while` ops are containers (their body
ops appear on the same line) and are excluded from totals.

Usage: python tools/render_trace_clusters.py [logdir]
"""

import glob
import re
import sys


def main(logdir="/tmp/xla_trace_render"):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))
    assert xplanes, "no xplane found"
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xplanes[-1], "rb").read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        lines = [l for l in plane.lines
                 if l.events and "Steps" not in l.name and "SparseCore" not in l.name]
        if not lines:
            continue
        line = max(lines, key=lambda l: len(l.events))
        agg = {}
        for ev in line.events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            c, t = agg.get(name, (0, 0.0))
            agg[name] = (c + 1, t + ev.duration_ps / 1e6)

        buckets = {}
        n_frames = 0
        for name, (c, t) in agg.items():
            if name.startswith("%while."):
                # container: body events are separately on this line
                n_frames = max(n_frames, c)
                continue
            if "mlp_base_net" in name or "mlp_net" in name:
                b = "base-field custom-calls"
            elif "4194304" in name:
                b = "prop-1 cluster (128 samp/ray)"
            elif "1572864" in name:
                b = "prop-2 cluster (48 samp/ray)"
            elif "1048576" in name or re.search(r"32768,32[,\]]", name):
                b = "nerf-sample machinery (32 samp/ray)"
            elif "32768" in name:
                b = "per-ray machinery / compositing"
            else:
                b = "other"
            cc, tt = buckets.get(b, (0, 0.0))
            buckets[b] = (cc + c, tt + t)
        total = sum(t for _, t in buckets.values())
        n_frames = max(n_frames, 1)
        print(f"== {plane.name}: {total/1e3/n_frames:.1f} ms/frame over "
              f"{n_frames} traced frames ==")
        for b, (c, t) in sorted(buckets.items(), key=lambda kv: -kv[1][1]):
            print(f"  {t/1e3/n_frames:8.1f} ms/frame {100*t/total:5.1f}%  "
                  f"{c//n_frames:>5} ops  {b}")


if __name__ == "__main__":
    main(*sys.argv[1:])
