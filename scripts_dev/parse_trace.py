"""Parse an xplane.pb and print top ops by total self duration."""
import sys, glob, collections
from tensorflow.tsl.profiler.protobuf import xplane_pb2

files = sorted(glob.glob("/tmp/bbx_trace/**/*.xplane.pb", recursive=True))
assert files, "no trace found"
xs = xplane_pb2.XSpace()
with open(files[-1], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print(f"== plane: {plane.name} ==")
    ev_meta = plane.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Steps" not in line.name and line.name != "XLA Ops":
            pass
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            dur = ev.duration_ps / 1e9  # ms
            agg[(line.name, name)] += dur
            cnt[(line.name, name)] += 1
    lines_seen = {l.name for l in plane.lines}
    print("lines:", lines_seen)
    for (ln, name), ms in agg.most_common(40):
        print(f"{ms:9.2f} ms  x{cnt[(ln,name)]:<5d} [{ln}] {name[:90]}")
