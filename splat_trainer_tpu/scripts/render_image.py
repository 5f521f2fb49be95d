"""Render a huge tiled overview image from a checkpoint.

Capability equivalent of /root/reference/splat_trainer/scripts/
render_image.py:44-62 (tiled overview render + depth tiff export).
"""

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("workspace")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--width", type=int, default=4096)
    p.add_argument("--height", type=int, default=3072)
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--depth", action="store_true", help="also export median depth")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    from splat_trainer_tpu.scripts.checkpoint_tools import with_trainer
    from splat_trainer_tpu.utils.render_image import frame_scene, render_tiled

    def run(trainer, _args):
        import cv2

        pts = np.asarray(trainer.scene.points["position"])
        active = np.asarray(trainer.scene.active)
        camera = frame_scene(pts[active], (args.width, args.height))

        def render_rgb(cam):
            return np.clip(np.asarray(trainer.render(cam).image), 0, 1)

        img = render_tiled(render_rgb, camera, tile=args.tile)
        out = Path(args.output or Path(args.workspace) / "overview.jpg")
        cv2.imwrite(str(out), cv2.cvtColor(
            (img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(f"wrote {out}")

        if args.depth:
            def render_depth(cam):
                r = trainer.render(cam, render_median_depth=True)
                return np.asarray(r.median_depth_image)[..., None]

            depth = render_tiled(render_depth, camera, tile=args.tile)[..., 0]
            dout = out.with_suffix(".depth.tiff")
            cv2.imwrite(str(dout), depth.astype(np.float32))
            print(f"wrote {dout}")

    # reuse the checkpoint loader plumbing
    import sys
    sys.argv = [sys.argv[0], args.workspace] + (
        ["--step", str(args.step)] if args.step is not None else [])
    with_trainer(run, [args.workspace] if args.step is None else
                 [args.workspace, "--step", str(args.step)],
                 "tiled overview render")


if __name__ == "__main__":
    main()
