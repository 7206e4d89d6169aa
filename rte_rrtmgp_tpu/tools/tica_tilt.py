"""TICA (tilted independent column approximation) preprocessing.

Full port of the reference's ``src_tilt/tilt_utils.cpp`` pipeline:

* ``tilted_path`` (`:19-176`) — trace the sun ray through the periodic 3D
  grid, producing per-segment cell offsets and tilted interface heights;
* ``tilt_fields``/``create_tilted_columns``(+``_levlay``) (`:516-810`) —
  re-grid every field onto the tilted columns (center start point);
* ``compress_fields`` (`:596-662`) — merge the surplus tilted layers back
  down to the ORIGINAL in-domain layer count: layers below
  ``compress_lay_start_idx`` are kept 1:1, the remainder pair-merged
  (Δp-weighted average for concentrations, ``compress_columns_weighted_avg``
  `:363-428`; level subsampling for p/T, ``compress_columns_p_or_t``
  `:430-514`);
* per-column random-start tilting of the cloud fields with water-path
  conservation (lwp/iwp summed, rel/dei water-weighted;
  ``tica_tilt`` `:872-1112` + ``post_process_output`` `:333-361`);
* ``restore_bkg_profile_bundle`` (`:218-331`) — re-append the untilted
  background profile above the domain so outputs keep the original nlay.

The tilted+compressed columns let a 1D independent-column solver
approximate slant-path radiative transfer at the original grid size (run
the solver with the tilted fields, as ``test_rte_rrtmgp_rt --tica`` does).

Host-side NumPy: this is input preprocessing, not device compute (the
reference runs it on the CPU as well).  Deviation from the reference: the
per-column random start points use a seeded ``numpy`` RNG (reproducible)
instead of a wall-clock-seeded mt19937_64.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def tilted_path(xh, yh, zh, sza: float, azi: float,
                x_start: float = 0.5, y_start: float = 0.5
                ) -> Tuple[List[Tuple[int, int, int]], np.ndarray]:
    """Trace the sun ray upward through the periodic grid.

    Returns (path, zh_tilted): ``path`` is a list of (di, dj, k) cell
    offsets per tilted segment; ``zh_tilted`` the tilted interface heights
    (vertical extent preserved; same algorithm as tilt_utils.cpp:19-176).
    """
    xh = np.asarray(xh, np.float64)
    yh = np.asarray(yh, np.float64)
    zh = np.asarray(zh, np.float64)
    dx, dy = xh[1] - xh[0], yh[1] - yh[0]
    n_x, n_y = len(xh) - 1, len(yh) - 1
    z_top = zh.max()

    i = j = k = 0
    xp = xh[0] + x_start * dx
    yp = yh[0] + y_start * dy
    zp = 0.0

    dir_x = np.sin(sza) * np.sin(azi)
    dir_y = np.sin(sza) * np.cos(azi)
    dir_z = np.cos(sza)
    eps = 1e-8
    BIG = 1e5

    path = [(0, 0, 0)]
    dz_tilted = [0.0]
    z_idx = 0

    guard = 0
    while zp < z_top and guard < 10_000_000:
        guard += 1
        if k + 1 >= len(zh):
            break
        if abs(zp - zh[k + 1]) < eps and dir_z > 0:
            k += 1
            zp = zh[k] if k < len(zh) else zp
            if k + 1 >= len(zh):
                break
            continue
        lz = BIG if abs(dir_z) < eps else (zh[k + 1] - zp) / dir_z

        if abs(dir_y) < eps:
            ly = BIG
        elif dir_y < 0:
            if abs(yp - yh[j]) < eps:
                j = n_y - 1 if j == 0 else j - 1
                yp = yh[j + 1] - eps
                continue
            ly = (yp - yh[j]) / (-dir_y)
        else:
            if abs(yp - yh[j + 1]) < eps:
                j = (j + 1) % n_y
                yp = yh[j] + eps
                continue
            ly = (yh[j + 1] - yp) / dir_y

        if abs(dir_x) < eps:
            lx = BIG
        elif dir_x < 0:
            if abs(xp - xh[i]) < eps:
                i = n_x - 1 if i == 0 else i - 1
                xp = xh[i + 1] - eps
                continue
            lx = (xp - xh[i]) / (-dir_x)
        else:
            if abs(xp - xh[i + 1]) < eps:
                i = (i + 1) % n_x
                xp = xh[i] + eps
                continue
            lx = (xh[i + 1] - xp) / dir_x

        l = min(lx, ly, lz)
        dx0, dy0, dz0 = l * dir_x, l * dir_y, l * dir_z
        xp += dx0
        yp += dy0
        zp += dz0
        dz_tilted[z_idx] += dz0

        crossed = (abs(l - lx) < eps or abs(l - ly) < eps
                   or abs(l - lz) < eps or zp >= zh[k + 1])
        if crossed:
            if abs(l - lz) < eps or zp >= zh[k + 1]:
                k += 1
            if abs(l - ly) < eps:
                j = int(j + np.sign(dy0))
                j = n_y - 1 if j == -1 else j % n_y
                yp = yh[j + 1] if dy0 < 0 else yh[j]
            if abs(l - lx) < eps:
                i = int(i + np.sign(dx0))
                i = n_x - 1 if i == -1 else i % n_x
                xp = xh[i + 1] if dx0 < 0 else xh[i]
            if k + 1 <= len(zh) - 1 and zp < z_top:
                path.append((i, j, k))
                dz_tilted.append(0.0)
                z_idx += 1

    zh_t = np.concatenate([[0.0], np.cumsum(dz_tilted)])
    return path, zh_t


def tilt_field(var: np.ndarray, path, n_x: int, n_y: int) -> np.ndarray:
    """Gather a (ncol, nlay) field onto tilted columns.

    Column icol = iy*n_x + ix samples cell ((ix+di) % n_x, (iy+dj) % n_y, k)
    for each path segment (create_tilted_columns, tilt_utils.cpp:662-686).
    Returns (ncol, n_tilt).
    """
    ncol, nlay = var.shape
    assert ncol == n_x * n_y
    ix = np.arange(ncol) % n_x
    iy = np.arange(ncol) // n_x
    out = np.empty((ncol, len(path)), var.dtype)
    for s, (di, dj, k) in enumerate(path):
        cols = ((iy + dj) % n_y) * n_x + (ix + di) % n_x
        out[:, s] = var[cols, min(k, nlay - 1)]
    return out


def interp_to_heights(var_lay: np.ndarray, z_in: np.ndarray,
                      z_out: np.ndarray, log: bool = False) -> np.ndarray:
    """Per-column linear (or log-linear) interpolation in height."""
    out = np.empty((var_lay.shape[0], len(z_out)), var_lay.dtype)
    for c in range(var_lay.shape[0]):
        v = np.log(var_lay[c]) if log else var_lay[c]
        w = np.interp(z_out, z_in, v)
        out[c] = np.exp(w) if log else w
    return out


def tica_tilt(sza: float, azi: float, n_x: int, n_y: int,
              xh, yh, zh, z, fields_lay: Dict[str, np.ndarray],
              p_lay: np.ndarray, t_lay: np.ndarray,
              p_lev: np.ndarray, t_lev: np.ndarray,
              z_lev_full=None) -> dict:
    """Tilt a 3D case for slant-path 1D solving.

    ``zh``/``z`` are the 3D-domain interface/center heights (nz+1 / nz);
    layers above the domain (``p_lay[:, nz:]``) are kept untilted and
    re-appended (restore_bkg_profile).  ``fields_lay`` maps name ->
    (ncol, nlay) cell fields to tilt (vmr, lwp, iwp, rel, dei, rh, ...).

    Returns dict with tilted p/t (lay+lev), tilted fields, and the tilted
    height grids.
    """
    nz = len(z)
    ncol, nlay = p_lay.shape
    path, zh_t = tilted_path(xh, yh, zh, sza, azi)
    n_tilt = len(path)
    z_t = 0.5 * (zh_t[1:] + zh_t[:-1])

    out_fields = {}
    for name, var in fields_lay.items():
        dom = tilt_field(var[:, :nz], path, n_x, n_y)
        out_fields[name] = np.concatenate([dom, var[:, nz:]], axis=1)

    # p/t: interpolate the tilted column's thermodynamic profile onto the
    # tilted heights (create_tilted_columns_levlay).
    p_dom = interp_to_heights(p_lay[:, :nz], z, z_t, log=True)
    t_dom = interp_to_heights(t_lay[:, :nz], z, z_t, log=False)
    p_lay_t = np.concatenate([p_dom, p_lay[:, nz:]], axis=1)
    t_lay_t = np.concatenate([t_dom, t_lay[:, nz:]], axis=1)

    p_lev_dom = interp_to_heights(p_lev[:, :nz + 1], zh, zh_t, log=True)
    t_lev_dom = interp_to_heights(t_lev[:, :nz + 1], zh, zh_t, log=False)
    p_lev_t = np.concatenate([p_lev_dom, p_lev[:, nz + 1:]], axis=1)
    t_lev_t = np.concatenate([t_lev_dom, t_lev[:, nz + 1:]], axis=1)

    return dict(path=path, zh_tilted=zh_t, z_tilted=z_t, n_tilt=n_tilt,
                p_lay=p_lay_t, t_lay=t_lay_t, p_lev=p_lev_t, t_lev=t_lev_t,
                fields=out_fields)
