"""Offline pairwise-flow loop detection (reference tracker/loop_detection.py
parity): estimate DROID flow magnitude between two image lists via the
motion-filter machinery, write a CSV, and report the minimum-flow pair.

    python tools/flow_loop_detect.py --list_a a.txt --list_b b.txt \
        --weights droid.pth --out flows.csv
"""

import argparse
import csv
import sys

import numpy as np

sys.path.insert(0, ".")
import jax.numpy as jnp  # noqa: E402


def load_image(path, H, W):
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (W, H)).astype(np.float32) / 255.0
    return jnp.asarray(img.transpose(2, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list_a", required=True)
    ap.add_argument("--list_b", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="flows.csv")
    ap.add_argument("--H", type=int, default=240)
    ap.add_argument("--W", type=int, default=320)
    args = ap.parse_args()

    import jax

    from mneslam_tpu.models import droid_net
    from mneslam_tpu.tracking.motion_filter import encode_context, encode_frame, flow_magnitude

    if args.weights:
        params = droid_net.load_droid_weights(args.weights)
    else:
        print("WARNING: no weights given — flow magnitudes are meaningless")
        params = droid_net.init_droid_net(jax.random.PRNGKey(0))

    paths_a = [l.strip() for l in open(args.list_a) if l.strip()]
    paths_b = [l.strip() for l in open(args.list_b) if l.strip()]

    rows = []
    best = (None, None, float("inf"))
    for pa in paths_a:
        img_a = load_image(pa, args.H, args.W)
        fmap_a = encode_frame(params, img_a)
        net_a, inp_a = encode_context(params, img_a)
        for pb in paths_b:
            img_b = load_image(pb, args.H, args.W)
            fmap_b = encode_frame(params, img_b)
            flow = float(flow_magnitude(params, fmap_a, fmap_b, net_a, inp_a))
            rows.append((pa, pb, flow))
            if flow < best[2]:
                best = (pa, pb, flow)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_a", "image_b", "flow_px"])
        w.writerows(rows)
    print(f"{len(rows)} pairs -> {args.out}")
    print(f"min-flow pair: {best[0]} <-> {best[1]} ({best[2]:.2f} px)")


if __name__ == "__main__":
    main()
