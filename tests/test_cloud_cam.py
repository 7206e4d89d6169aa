"""accumulate_clouds (per-pixel cloud-path camera images) tests
(reference accumulate_clouds_kernel, raytracer_kernels_bw.cu:773-889)."""

import numpy as np
import jax.numpy as jnp

from rte_rrtmgp_tpu.models.raytracer_bw import Camera, accumulate_clouds

NZ, NY, NX = 8, 4, 4
DZ, DY, DX = 250.0, 500.0, 500.0


def _fields(cloud_k=None):
    lwp = np.zeros((NZ, NY, NX), np.float32)
    iwp = np.zeros((NZ, NY, NX), np.float32)
    tau = np.zeros((NZ, NY, NX), np.float32)
    if cloud_k is not None:
        lwp[cloud_k] = 10.0
        iwp[cloud_k] = 5.0
        tau[cloud_k] = 2.0
    return jnp.asarray(lwp), jnp.asarray(iwp), jnp.asarray(tau)


def test_nadir_camera_integrates_column():
    cam = Camera(position=(0, 0, 0), cam_type=2, nx=NX, ny=NY)
    lwp, iwp, tau = _fields(cloud_k=3)
    liwp, tauc, dist, zen = accumulate_clouds(
        cam, (DZ, DY, DX), (NZ, NY, NX), lwp, iwp, tau)
    # Vertical rays: path through the single cloudy layer = dz, and the
    # kernel divides by dz -> liwp = lwp+iwp of that layer exactly.
    np.testing.assert_allclose(np.asarray(liwp), 15.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tauc), 2.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(zen), np.pi, rtol=1e-6)
    # Distance accumulates up to AND THROUGH the first cloudy cell (the
    # reference increments dist before checking reached_cloud,
    # raytracer_kernels_bw.cu:855-859): top (NZ*DZ) down through layer 3.
    np.testing.assert_allclose(np.asarray(dist), (NZ - 3) * DZ, rtol=1e-3)


def test_clear_sky_no_cloud_distance():
    cam = Camera(position=(0, 0, 0), cam_type=2, nx=NX, ny=NY)
    lwp, iwp, tau = _fields(cloud_k=None)
    liwp, tauc, dist, _ = accumulate_clouds(
        cam, (DZ, DY, DX), (NZ, NY, NX), lwp, iwp, tau)
    assert np.all(np.asarray(liwp) == 0.0)
    assert np.all(np.asarray(tauc) == 0.0)
    assert np.all(np.asarray(dist) == -1.0)


def test_fisheye_camera_inside_domain():
    cam = Camera(position=(NX * DX / 2, NY * DY / 2, DZ / 2),
                 cam_type=0, fov=180.0, nx=8, ny=8)
    lwp, iwp, tau = _fields(cloud_k=6)
    liwp, tauc, dist, zen = accumulate_clouds(
        cam, (DZ, DY, DX), (NZ, NY, NX), lwp, iwp, tau)
    assert np.all(np.isfinite(np.asarray(liwp)))
    assert np.asarray(liwp).max() > 0.0       # some rays hit the cloud layer
    assert np.all(np.asarray(zen) >= 0.0) and np.all(np.asarray(zen) <= np.pi)
