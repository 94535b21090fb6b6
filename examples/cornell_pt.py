"""Cornell Box path tracing — the README's path-tracing walkthrough
(README.md:478-560: PathTracing render, Cornell parts, 16-2048 spp).

Usage: python examples/cornell_pt.py [--width 256] [--height 256]
       [--spp 16] [--out /tmp/cornell.png] [--cpu] [--ckpt PATH]
       [--batch N]   (renders progressively in N-sample batches)
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--batch", type=int, default=0,
                    help="progressive batch size (0 = single shot)")
    ap.add_argument("--out", default="/tmp/cornell.png")
    ap.add_argument("--ckpt", default="", help="checkpoint path for resume")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from software_rasterizer_tpu.render import PathTracing, Primitive
    from software_rasterizer_tpu.scenes import build_cornell_scene

    render = PathTracing(args.width, args.height, spp=args.spp)
    scene = build_cornell_scene()
    render.add_scene(scene)

    t0 = time.time()
    if args.batch:
        import os

        if args.ckpt and os.path.exists(args.ckpt):
            render.load_checkpoint(scene.name, args.ckpt)
            print(f"resumed at {render.samples_done(scene.name)} spp")
        while render.samples_done(scene.name) < args.spp:
            n = min(args.batch, args.spp - render.samples_done(scene.name))
            render.accumulate(scene.name, n)
            done = render.samples_done(scene.name)
            print(f"{done}/{args.spp} spp, {time.time() - t0:.1f}s")
            if args.ckpt:
                render.save_checkpoint(scene.name, args.ckpt)
        render.resolve(scene.name)
    else:
        render.draw(Primitive.TRIANGLES)
    dt = time.time() - t0

    n_paths = args.width * args.height * args.spp
    print(f"{args.width}x{args.height} @ {args.spp} spp in {dt:.2f}s "
          f"({n_paths / dt / 1e6:.2f} Mpaths/s incl. compile)")
    render.save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
