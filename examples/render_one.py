"""End-to-end single-volume render demo — the reference's
mitsuba3/run_render.py capability (example render of one volume from the
satellite constellation, per-view figures with centered-meter axes, and a
3-D scene-geometry debug plot), plus the debug.py flow (synthetic
sphere/cube/pyramid volume + multi-view homography alignment check).

Run:  python examples/render_one.py [patch.pkl] [--out-dir out/]
With no pkl argument it renders the synthetic debug volume.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from unet_convlstm_tpu.datagen.overpass import (  # noqa: E402
    camera_schedule, read_overpass_csv, sun_direction,
    synthesize_overpass_csv,
)
from unet_convlstm_tpu.datagen.renderer import (  # noqa: E402
    VolumeScene, make_synthetic_debug_volume, render_radiance,
    sun_transmittance,
)
from unet_convlstm_tpu.datagen.alignment import warp_to_virtual_camera  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pkl", nargs="?", default=None,
                    help="stage-A patch pkl (default: synthetic debug volume)")
    ap.add_argument("--csv", default=None, help="overpass CSV")
    ap.add_argument("--out-dir", default="render_one_out")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--fov", type=float, default=0.115)
    ap.add_argument("--g", type=float, default=0.85)
    ap.add_argument("--voxel", type=float, default=20.0)
    ap.add_argument("--width", type=int, default=128,
                    help="synthetic debug volume xy size [voxels]")
    ap.add_argument("--depth", type=int, default=64,
                    help="synthetic debug volume z size [voxels]")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    if args.pkl:
        with open(args.pkl, "rb") as f:
            beta = pickle.load(f)["beta_ext"]
    else:
        print("no pkl given — using the synthetic debug volume "
              "(sphere + cube + pyramid + border)")
        beta = make_synthetic_debug_volume(width=args.width,
                                           depth=args.depth)

    csv_path = args.csv or synthesize_overpass_csv(
        os.path.join(args.out_dir, "overpass_synth.csv"))
    times, schedule = camera_schedule(read_overpass_csv(csv_path))
    views = schedule[times[0]]
    sun = sun_direction(views[0].sun_zenith, views[0].sun_azimuth)

    scene = VolumeScene(np.asarray(beta, np.float32), args.voxel)
    t_sun = sun_transmittance(scene, sun)
    z_center = (scene.min_bound[2] + scene.max_bound[2]) / 2
    target = np.array([0.0, 0.0, z_center * 2.5])

    half_m = scene.max_bound[0]
    extent = [-half_m, half_m, -half_m, half_m]
    images = []
    for i, view in enumerate(views):
        origin_km, _, up = view.renderer_camera_km(0.0)
        img = np.asarray(render_radiance(
            scene, origin_km * 1000.0, target, up, args.fov,
            (args.res, args.res), sun, g=args.g, t_sun=t_sun))
        images.append((view, img))
        fig, ax = plt.subplots(figsize=(6, 6))
        im = ax.imshow(img ** 0.5, cmap="gray", extent=extent)  # γ=0.5
        ax.set_xlabel("x [m] (centered)")
        ax.set_ylabel("y [m] (centered)")
        ax.set_title(f"view {i}: zenith {view.sat_zenith:.1f}°, "
                     f"radiance (γ=0.5)")
        fig.colorbar(im, ax=ax, fraction=0.046)
        fig.savefig(os.path.join(args.out_dir, f"view_{i}.pdf"),
                    bbox_inches="tight")
        plt.close(fig)
        print(f"view {i}: radiance range [{img.min():.4f}, {img.max():.4f}]")

    # scene-geometry debug plot (run_render.py:295-460 capability)
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    for i, (view, _) in enumerate(images):
        p = view.renderer_camera_km(0.0)[0]
        ax.scatter(*p, s=60, label=f"sat {i}")
        ax.plot([p[0], 0], [p[1], 0], [p[2], z_center * 2.5e-3], "k--",
                lw=0.5)
    ax.scatter([0], [0], [0], c="blue", marker="^", s=100, label="cloud")
    sun_end = -sun * 300
    ax.plot([0, sun_end[0]], [0, sun_end[1]], [0, sun_end[2]], "y-",
            lw=2, label="to sun")
    ax.legend()
    ax.set_title("scene geometry [km]")
    fig.savefig(os.path.join(args.out_dir, "scene_geometry.pdf"))
    plt.close(fig)

    # homography alignment check (debug.py:103-176 capability): warp every
    # view into a virtual nadir camera at 600 km and difference them
    f_px = (args.res / 2) / np.tan(np.radians(args.fov / 2))
    K = np.array([[f_px, 0, args.res / 2],
                  [0, f_px, args.res / 2],
                  [0, 0, 1.0]])
    virt = np.array([0.0, 0.0, 600_000.0])
    plane_h = float(z_center)
    warped = []
    for i, (view, img) in enumerate(images):
        src_pose = view.caster_camera_m()[0]
        w = warp_to_virtual_camera(img, src_pose, virt, K, args.res, plane_h)
        warped.append(w)
    fig, axes = plt.subplots(1, len(warped) + 1,
                             figsize=(5 * (len(warped) + 1), 5))
    for i, w in enumerate(warped):
        axes[i].imshow(w ** 0.5, cmap="gray")
        axes[i].set_title(f"view {i} → virtual nadir")
    if len(warped) >= 2:
        axes[-1].imshow(np.abs(warped[0] - warped[1]), cmap="inferno")
        axes[-1].set_title("|view0 - view1| aligned")
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.savefig(os.path.join(args.out_dir, "alignment_check.pdf"),
                bbox_inches="tight")
    plt.close(fig)
    print(f"outputs -> {args.out_dir}")


if __name__ == "__main__":
    main()
