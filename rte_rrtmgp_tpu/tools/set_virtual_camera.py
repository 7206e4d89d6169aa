"""Add/modify the "camera-settings" group of a ray-tracer input file.

Port of ``python/set_virtual_camera.py`` (same variables and presets).
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np

CAMERA_VARIABLES = {
    "yaw": 0.0, "pitch": 0.0, "roll": 0.0, "cam_type": 1.0, "fov": 80.0,
    "px": 0.0, "py": 0.0, "pz": 500.0, "nx": 256.0, "ny": 256.0,
    "f_zoom": 1.0,
}

PRESETS = {
    # sky-view hemispheric radiance camera at the surface
    "radiance": dict(cam_type=0.0, pitch=-90.0, fov=180.0, pz=1.0,
                     nx=128, ny=128),
    # horizontal-view image camera at 500 m
    "image": dict(cam_type=1.0, yaw=0.0, pitch=0.0, fov=80.0, pz=500.0,
                  nx=256, ny=256),
    # top-of-atmosphere nadir radiances
    "toa": dict(cam_type=2.0, nx=128, ny=128),
}


def set_camera(path: str, values: dict, sza=None, azi=None) -> None:
    with h5py.File(path, "r+") as f:
        grp = f.require_group("camera-settings")
        merged = dict(CAMERA_VARIABLES)
        merged.update({k: v for k, v in values.items() if v is not None})
        for k, v in merged.items():
            if k in grp:
                grp[k][...] = v
            else:
                grp.create_dataset(k, data=np.float64(v))
        for name, val in (("sza", sza), ("azi", azi)):
            if val is None:
                continue
            if name in f:
                f[name][...] = np.deg2rad(val)
            else:
                f.create_dataset(name, data=np.float64(np.deg2rad(val)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    for preset in PRESETS:
        p.add_argument(f"--{preset}", action="store_true")
    p.add_argument("--sza", type=float)
    p.add_argument("--azi", type=float)
    p.add_argument("--name", default="rte_rrtmgp_input.nc")
    for var in CAMERA_VARIABLES:
        p.add_argument(f"--{var}", type=float)
    args = vars(p.parse_args(argv))

    values = {}
    for preset, preset_vals in PRESETS.items():
        if args.pop(preset):
            values.update(preset_vals)
    values.update({k: args[k] for k in CAMERA_VARIABLES if args.get(k) is not None})
    set_camera(args["name"], values, args.get("sza"), args.get("azi"))
    print(f"camera-settings updated in {args['name']}")


if __name__ == "__main__":
    main()
