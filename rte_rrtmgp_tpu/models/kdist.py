"""RRTMGP k-distribution tables as a JAX pytree.

``KDist`` is the TPU-native replacement for the reference
``Gas_optics_rrtmgp`` class (``include/Gas_optics_rrtmgp.h`` +
``src/Gas_optics_rrtmgp.cpp``).  All the "fiddly" init-time logic of
``init_abs_coeffs`` (``src/Gas_optics_rrtmgp.cpp:539-742``) happens here once
at load time in NumPy:

* gas-union reduction to the gases available in the host model,
* minor-absorber array reduction (``reduce_minor_arrays``, `:54-162`),
* flavor / g-point-flavor construction (`:247-363`),
* kmajor / krayl / planck_frac memory-layout normalization (`:657-677`),
* solar-variability composition (`:745-760`).

Float tables are pytree *data* (become device arrays inside jit); all index
metadata (flavors, g-point maps, minor-interval specs) is *static* so the
minor-gas ragged loops unroll at trace time into static slices — the
TPU-friendly densification of the reference's ragged ``kminor_start`` /
``minor_limits_gpt`` indirection.

Array layouts (0-based, C-order; chosen to match the semantics of the CUDA
batch backend's flattened indexing, see
``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu:398-443``):

* ``kmajor``      (ngpt, npress+1, neta, ntemp)
* ``kminor_*``    (ncontrib, neta, ntemp)
* ``krayl``       (2, ngpt, neta, ntemp)   [0]=troposphere, [1]=upper
* ``planck_frac`` (ngpt, npress+1, neta, ntemp)
* ``totplnk``     (nPlanckTemp, nbnd)
* ``vmr_ref``     (2, ngas+1, ntemp)       gas 0 = dry air
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ..utils.pytree import pytree_dataclass
from .. import config


class MinorSpec(NamedTuple):
    """Static description of one minor-absorber interval (one atmosphere).

    Replaces the reference's parallel arrays ``minor_limits_gpt``,
    ``idx_minor``, ``idx_minor_scaling``, ``minor_scales_with_density``,
    ``scale_by_complement``, ``kminor_start``
    (``src/Gas_optics_rrtmgp.cpp:607-698``).
    """

    gpt_start: int            # 0-based inclusive
    gpt_end: int              # 0-based exclusive
    idx_minor: int            # col_gas axis index (1-based gas; 0 = dry air)
    idx_scaling: int          # col_gas axis index of scaling gas, 0 = none
    scales_with_density: bool
    scale_by_complement: bool
    kminor_start: int         # 0-based start row in the reduced kminor table
    flavor: int               # 0-based flavor index for this interval's gpts


_META = (
    "gas_names", "idx_h2o", "flavor", "gpoint_flavor", "gpt2band",
    "band_lims_gpt", "minor_lower", "minor_upper",
    "press_ref_trop_log", "press_ref_log_delta",
    "temp_ref_min", "temp_ref_max", "temp_ref_delta",
    "press_ref_min", "press_ref_max", "totplnk_delta",
    "band_lims_wvn",
)


@pytree_dataclass(meta_fields=_META)
class KDist:
    # ---- float tables (pytree data) ----
    kmajor: object
    kminor_lower: object
    kminor_upper: object
    krayl: object                 # None for pure-absorption (LW) k-dists
    planck_frac: object           # LW only
    totplnk: object               # LW only
    solar_source: object          # SW only
    solar_source_quiet: object
    solar_source_facular: object
    solar_source_sunspot: object
    press_ref_log: object         # (npress,)
    temp_ref: object              # (ntemp,)
    vmr_ref: object               # (2, ngas+1, ntemp)

    # ---- derived row-major gather tables (see ops/gas_optics.py) ----
    # TPU element gathers are catastrophically slow (scalar path) while row
    # gathers (gpt on the 128-lane axis) run near memory bandwidth, so the
    # interpolation tables are re-laid-out at load time into 2-D "row"
    # forms addressed by a single per-(col,lay) scalar index:
    kmajor_rows: object           # ((npress+1)*ntemp, neta, ngpt)
    planck_rows: object           # ((npress+1)*ntemp, neta, ngpt); LW only
    krayl_rows: object            # (2*ntemp, neta, ngpt); SW only
    kminor_lower_rows: object     # ((neta-1)*ntemp, 2, ncont_lower)
    kminor_upper_rows: object     # ((neta-1)*ntemp, 2, ncont_upper)
    kminor_lower_trows: object    # (ntemp, neta, ncont_lower) — Pallas path
    kminor_upper_trows: object    # (ntemp, neta, ncont_upper)
    ratio_rows: object            # (2*ntemp, nflav): vmr_ref[g1]/vmr_ref[g2]

    # ---- static metadata ----
    gas_names: Tuple[str, ...]
    idx_h2o: int                          # col_gas axis index of h2o
    flavor: Tuple[Tuple[int, int], ...]   # (nflav, 2) col_gas axis indices
    gpoint_flavor: Tuple[Tuple[int, ...], Tuple[int, ...]]  # (2, ngpt) 0-based
    gpt2band: Tuple[int, ...]             # (ngpt,) 0-based band index
    band_lims_gpt: Tuple[Tuple[int, int], ...]  # (nbnd, 2) 0-based half-open
    minor_lower: Tuple[MinorSpec, ...]
    minor_upper: Tuple[MinorSpec, ...]
    press_ref_trop_log: float
    press_ref_log_delta: float
    temp_ref_min: float
    temp_ref_max: float
    temp_ref_delta: float
    press_ref_min: float
    press_ref_max: float
    totplnk_delta: Optional[float]
    band_lims_wvn: Tuple[Tuple[float, float], ...]

    # ---- derived sizes ----
    @property
    def ngas(self) -> int:
        return len(self.gas_names)

    @property
    def nflav(self) -> int:
        return len(self.flavor)

    @property
    def ngpt(self) -> int:
        return self.kmajor.shape[0]

    @property
    def neta(self) -> int:
        return self.kmajor.shape[2]

    @property
    def npress(self) -> int:
        return self.kmajor.shape[1] - 1

    @property
    def ntemp(self) -> int:
        return self.kmajor.shape[3]

    @property
    def nbnd(self) -> int:
        return len(self.band_lims_gpt)

    @property
    def source_is_internal(self) -> bool:
        """True for longwave (Planck) k-distributions."""
        return self.totplnk is not None

    @property
    def has_rayleigh(self) -> bool:
        return self.krayl is not None

    def slice_gpt(self, g0: int, g1: int) -> "KDist":
        """Restrict the k-distribution to g-points [g0, g1).

        The TPU-native generalization of the reference's per-g-point
        streaming backend (``Gas_optics_rrtmgp_rt``,
        ``src_cuda_rt/Gas_optics_rrtmgp_rt.cu:405-415``): spectral chunks
        become first-class k-distributions, so the whole pipeline can be run
        chunk-by-chunk with O(ncol*nlay*chunk) memory.  Slicing happens at
        trace time (static), so it is free inside jit.

        Band metadata keeps *global* band indices (``gpt2band``) so chunked
        by-band accumulation scatters into the global band axis.
        """
        import dataclasses

        def slc(a, axis=0):
            if a is None:
                return None
            return jax.lax.slice_in_dim(a, g0, g1, axis=axis)

        import jax

        new_minor = {"minor_lower": [], "minor_upper": []}
        for key in ("minor_lower", "minor_upper"):
            for s in getattr(self, key):
                lo = max(s.gpt_start, g0)
                hi = min(s.gpt_end, g1)
                if lo >= hi:
                    continue
                new_minor[key].append(s._replace(
                    gpt_start=lo - g0,
                    gpt_end=hi - g0,
                    kminor_start=s.kminor_start + (lo - s.gpt_start),
                ))

        return dataclasses.replace(
            self,
            kmajor=slc(self.kmajor),
            krayl=slc(self.krayl, axis=1),
            planck_frac=slc(self.planck_frac),
            kmajor_rows=slc(self.kmajor_rows, axis=2),
            planck_rows=slc(self.planck_rows, axis=2),
            krayl_rows=slc(self.krayl_rows, axis=2),
            # kminor_*_rows / ratio_rows are not g-indexed: the minor tables
            # are addressed by per-spec static column ranges (kminor_start
            # stays a full-table offset) and the ratio table is per-flavor.
            solar_source=slc(self.solar_source),
            solar_source_quiet=slc(self.solar_source_quiet),
            solar_source_facular=slc(self.solar_source_facular),
            solar_source_sunspot=slc(self.solar_source_sunspot),
            gpoint_flavor=(self.gpoint_flavor[0][g0:g1],
                           self.gpoint_flavor[1][g0:g1]),
            gpt2band=self.gpt2band[g0:g1],
            band_lims_gpt=tuple(
                (max(b0, g0) - g0, min(b1, g1) - g0)
                for (b0, b1) in self.band_lims_gpt if max(b0, g0) < min(b1, g1)),
            minor_lower=tuple(new_minor["minor_lower"]),
            minor_upper=tuple(new_minor["minor_upper"]),
        )

    def with_solar_variability(self, mg_index: float, sb_index: float) -> "KDist":
        """Recompose the solar source (reference ``set_solar_variability``,
        ``src/Gas_optics_rrtmgp.cpp:745-760``)."""
        import dataclasses

        solar = (self.solar_source_quiet
                 + (mg_index - config.SOLAR_A_OFFSET) * self.solar_source_facular
                 + (sb_index - config.SOLAR_B_OFFSET) * self.solar_source_sunspot)
        return dataclasses.replace(self, solar_source=solar)

    def total_solar_irradiance(self) -> float:
        return float(np.sum(np.asarray(self.solar_source)))

    # ------------------------------------------------------------------
    @staticmethod
    def from_netcdf(path: str, available_gases: Sequence[str],
                    dtype=None) -> "KDist":
        """Load a k-distribution coefficient NetCDF file (same variable names
        as the files consumed by ``src_test/Radiation_solver.cpp:70-284``)."""
        from ..utils.ncio import NcReader

        raw = {}
        with NcReader(path) as nc:
            for name in nc.variables():
                raw[name] = nc.read(name)
        return KDist.from_raw(raw, available_gases, dtype=dtype)

    @staticmethod
    def from_raw(raw: dict, available_gases: Sequence[str], dtype=None) -> "KDist":
        """Build a KDist from raw file-layout arrays (C-order, as h5py reads
        the coefficient files).  Implements ``init_abs_coeffs``."""
        dtype = dtype or config.FLOAT
        available = {g.lower() for g in available_gases}

        def strings(name):
            from ..utils.ncio import _decode_strings
            return [s.lower() for s in _decode_strings(np.asarray(raw[name])).reshape(-1)]

        file_gas_names = strings("gas_names")
        gas_minor = strings("gas_minor")
        identifier_minor = strings("identifier_minor")

        # --- gas union reduction (src/Gas_optics_rrtmgp.cpp:571-605) ---
        gas_names = tuple(g for g in file_gas_names if g in available)
        if not gas_names:
            raise ValueError("no requested gas is known to this k-distribution")
        ngas = len(gas_names)

        # vmr_ref: file C-order (ntemp, n_ext, 2) -> (2, ngas+1, ntemp).
        vmr_file = np.asarray(raw["vmr_ref"], dtype=np.float64)
        ntemp = vmr_file.shape[0]
        v = np.transpose(vmr_file, (2, 1, 0))  # (2, n_ext, ntemp)
        vmr_ref = np.zeros((2, ngas + 1, ntemp))
        vmr_ref[:, 0, :] = v[:, 0, :]  # dry air
        for i, g in enumerate(gas_names):
            idx = file_gas_names.index(g)       # 0-based in file list
            vmr_ref[:, i + 1, :] = v[:, idx + 1, :]

        # --- key species -> flavors (src/Gas_optics_rrtmgp.cpp:198-363) ---
        # key_species file C-order: (nbnd, 2 atm, 2 pair); entries are 1-based
        # indices into the FILE gas list (0 = none).
        ks_file = np.asarray(raw["key_species"], dtype=np.int64)
        nbnd = ks_file.shape[0]
        key_species_red = np.zeros_like(ks_file)
        for ib in range(nbnd):
            for ia in range(2):
                for ip in range(2):
                    kss = ks_file[ib, ia, ip]
                    if kss == 0:
                        key_species_red[ib, ia, ip] = 0
                    else:
                        g = file_gas_names[kss - 1]
                        if g not in gas_names:
                            raise ValueError(
                                f"gas optics: required key gas {g!r} is missing")
                        key_species_red[ib, ia, ip] = gas_names.index(g) + 1

        # flavor = unique key-species pairs in first-appearance order, with
        # the (0,0) pair rewritten to (2,2) (create_flavor, `:247-313`).
        pairs = []
        for ib in range(nbnd):
            for ia in range(2):
                p = tuple(key_species_red[ib, ia, :])
                if p == (0, 0):
                    p = (2, 2)
                if p not in pairs:
                    pairs.append(p)
        flavor = tuple((int(a), int(b)) for a, b in pairs)

        # band -> gpt map; file band2gpt C-order (nbnd, 2), 1-based inclusive.
        b2g = np.asarray(raw["bnd_limits_gpt"], dtype=np.int64)
        band_lims_gpt = tuple((int(b2g[ib, 0] - 1), int(b2g[ib, 1])) for ib in range(nbnd))
        ngpt = int(b2g[:, 1].max())
        gpt2band_np = np.zeros(ngpt, dtype=np.int64)
        for ib, (g0, g1) in enumerate(band_lims_gpt):
            gpt2band_np[g0:g1] = ib
        gpt2band = tuple(int(x) for x in gpt2band_np)

        # gpoint_flavor (create_gpoint_flavor, `:331-363`): row 0 =
        # troposphere (atm index 1 in 1-based Fortran), row 1 = upper.
        gpf = np.zeros((2, ngpt), dtype=np.int64)
        for igpt in range(ngpt):
            ib = gpt2band_np[igpt]
            for ia in range(2):
                p = tuple(key_species_red[ib, ia, :])
                if p == (0, 0):
                    p = (2, 2)
                gpf[ia, igpt] = pairs.index(p)  # 0-based flavor
        gpoint_flavor = (tuple(int(x) for x in gpf[0]), tuple(int(x) for x in gpf[1]))

        # --- minor absorber reduction (reduce_minor_arrays, `:54-162`) ---
        def reduce_minor(suffix: str):
            mg = strings(f"minor_gases_{suffix}")
            lims = np.asarray(raw[f"minor_limits_gpt_{suffix}"], dtype=np.int64)  # (nm, 2) 1-based
            swd = np.asarray(raw[f"minor_scales_with_density_{suffix}"]).astype(bool).reshape(-1)
            sbc = np.asarray(raw[f"scale_by_complement_{suffix}"]).astype(bool).reshape(-1)
            scaling_gas = strings(f"scaling_gas_{suffix}")
            kstart = np.asarray(raw[f"kminor_start_{suffix}"], dtype=np.int64).reshape(-1)  # 1-based
            kminor_file = np.asarray(raw[f"kminor_{suffix}"], dtype=np.float64)  # (ntemp, neta, ncont)

            specs = []
            kept_rows = []
            new_start = 0
            for i, ident in enumerate(mg):
                idx_mnr = identifier_minor.index(ident)
                gas = gas_minor[idx_mnr].strip()
                if gas not in available:
                    continue
                ng = int(lims[i, 1] - lims[i, 0] + 1)
                rows = np.arange(kstart[i] - 1, kstart[i] - 1 + ng)
                kept_rows.append(rows)
                sgas = scaling_gas[i].strip()
                idx_scaling = (gas_names.index(sgas) + 1) if sgas in gas_names else 0
                g0 = int(lims[i, 0] - 1)
                specs.append(MinorSpec(
                    gpt_start=g0,
                    gpt_end=int(lims[i, 1]),
                    idx_minor=gas_names.index(gas) + 1,
                    idx_scaling=idx_scaling,
                    scales_with_density=bool(swd[i]),
                    scale_by_complement=bool(sbc[i]),
                    kminor_start=new_start,
                    flavor=int(gpf[0 if suffix == "lower" else 1, g0]),
                ))
                new_start += ng
            if kept_rows:
                rows = np.concatenate(kept_rows)
                kminor_red = kminor_file[:, :, rows]  # (ntemp, neta, ncont_red)
            else:
                kminor_red = np.zeros((ntemp, kminor_file.shape[1], 0))
            # -> (ncontrib, neta, ntemp)
            return tuple(specs), np.transpose(kminor_red, (2, 1, 0))

        minor_lower, kminor_lower = reduce_minor("lower")
        minor_upper, kminor_upper = reduce_minor("upper")

        # --- major/rayleigh/planck table layout normalization ---
        kmajor_file = np.asarray(raw["kmajor"], dtype=np.float64)  # (ntemp, npress+1, neta, ngpt)
        kmajor = np.transpose(kmajor_file, (3, 1, 2, 0))           # (ngpt, npress+1, neta, ntemp)

        krayl = None
        if "rayl_lower" in raw:
            rl = np.asarray(raw["rayl_lower"], dtype=np.float64)   # (ntemp, neta, ngpt)
            ru = np.asarray(raw["rayl_upper"], dtype=np.float64)
            krayl = np.stack([np.transpose(rl, (2, 1, 0)),
                              np.transpose(ru, (2, 1, 0))])        # (2, ngpt, neta, ntemp)

        planck_frac = totplnk = None
        solar = solar_q = solar_f = solar_s = None
        totplnk_delta = None
        press_ref = np.asarray(raw["press_ref"], dtype=np.float64).reshape(-1)
        temp_ref = np.asarray(raw["temp_ref"], dtype=np.float64).reshape(-1)
        temp_ref_min = float(temp_ref[0])
        temp_ref_max = float(temp_ref[-1])

        if "totplnk" in raw:
            tp = np.asarray(raw["totplnk"], dtype=np.float64)      # (nbnd, nT)
            totplnk = np.transpose(tp)                              # (nT, nbnd)
            pf = np.asarray(raw["plank_fraction"], dtype=np.float64)
            planck_frac = np.transpose(pf, (3, 1, 2, 0))
            totplnk_delta = (temp_ref_max - temp_ref_min) / (totplnk.shape[0] - 1)
        else:
            solar_q = np.asarray(raw["solar_source_quiet"], dtype=np.float64).reshape(-1)
            solar_f = np.asarray(raw["solar_source_facular"], dtype=np.float64).reshape(-1)
            solar_s = np.asarray(raw["solar_source_sunspot"], dtype=np.float64).reshape(-1)
            mg = float(np.asarray(raw["mg_default"]).reshape(-1)[0])
            sb = float(np.asarray(raw["sb_default"]).reshape(-1)[0])
            solar = (solar_q + (mg - config.SOLAR_A_OFFSET) * solar_f
                     + (sb - config.SOLAR_B_OFFSET) * solar_s)

        press_ref_log = np.log(press_ref)
        press_ref_trop_log = float(np.log(np.asarray(raw["press_ref_trop"]).reshape(-1)[0]))
        npress = press_ref.shape[0]
        # press_ref is stored max -> min; delta is negative.
        press_ref_log_delta = float(
            (np.log(press_ref[-1]) - np.log(press_ref[0])) / (npress - 1))
        temp_ref_delta = float((temp_ref_max - temp_ref_min) / (ntemp - 1))

        if "h2o" not in gas_names:
            raise ValueError("h2o must be among the available gases")

        blw = np.asarray(raw["bnd_limits_wavenumber"], dtype=np.float64)
        band_lims_wvn = tuple((float(blw[ib, 0]), float(blw[ib, 1])) for ib in range(nbnd))

        # --- derived row-gather table layouts (float64, cast below) ---
        # kmajor (ngpt, npress+1, neta, ntemp) -> rows (p*T + t, e, g)
        npress1 = kmajor.shape[1]
        kmajor_rows = np.transpose(kmajor, (1, 3, 2, 0)).reshape(
            npress1 * ntemp, kmajor.shape[2], ngpt)
        planck_rows = None
        if planck_frac is not None:
            planck_rows = np.transpose(planck_frac, (1, 3, 2, 0)).reshape(
                npress1 * ntemp, planck_frac.shape[2], ngpt)
        krayl_rows = None
        if krayl is not None:
            # (2, ngpt, neta, ntemp) -> rows (itropo*T + t, e, g)
            krayl_rows = np.transpose(krayl, (0, 3, 2, 1)).reshape(
                2 * ntemp, krayl.shape[2], ngpt)

        def minor_rows(km):
            # km (ncont, neta, ntemp) -> rows (je*T + t, de, ncont) with the
            # eta corner pre-expanded: row[je*T+t, de, :] = km[:, je+de, t].
            ncont, neta_m, ntemp_m = km.shape
            out = np.empty(((neta_m - 1) * ntemp_m, 2, ncont))
            for de in range(2):
                # (je, t, ncont)
                out.reshape(neta_m - 1, ntemp_m, 2, ncont)[:, :, de, :] = (
                    np.transpose(km[:, de:de + neta_m - 1, :], (1, 2, 0)))
            return out

        kminor_lower_rows = minor_rows(kminor_lower)
        kminor_upper_rows = minor_rows(kminor_upper)
        # (ncont, neta, ntemp) -> (ntemp, neta, ncont): temperature-row
        # layout for the Pallas minor path (eta selected in-kernel).
        kminor_lower_trows = np.transpose(kminor_lower, (2, 1, 0)).copy()
        kminor_upper_trows = np.transpose(kminor_upper, (2, 1, 0)).copy()

        # binary-species mixing ratio eta numerator/denominator ratio,
        # precomputed per (atmosphere, temp, flavor); 0/0 handled exactly as
        # the reference's runtime division would.
        with np.errstate(divide="ignore", invalid="ignore"):
            g1 = np.array([f[0] for f in flavor])
            g2 = np.array([f[1] for f in flavor])
            ratio_rows = (vmr_ref[:, g1, :] / vmr_ref[:, g2, :]).transpose(
                0, 2, 1).reshape(2 * ntemp, len(flavor))

        cast = lambda a: None if a is None else np.asarray(a, dtype=dtype)
        return KDist(
            kmajor=cast(kmajor),
            kmajor_rows=cast(kmajor_rows),
            planck_rows=cast(planck_rows),
            krayl_rows=cast(krayl_rows),
            kminor_lower_rows=cast(kminor_lower_rows),
            kminor_upper_rows=cast(kminor_upper_rows),
            kminor_lower_trows=cast(kminor_lower_trows),
            kminor_upper_trows=cast(kminor_upper_trows),
            ratio_rows=cast(ratio_rows),
            kminor_lower=cast(kminor_lower),
            kminor_upper=cast(kminor_upper),
            krayl=cast(krayl),
            planck_frac=cast(planck_frac),
            totplnk=cast(totplnk),
            solar_source=cast(solar),
            solar_source_quiet=cast(solar_q),
            solar_source_facular=cast(solar_f),
            solar_source_sunspot=cast(solar_s),
            press_ref_log=cast(press_ref_log),
            temp_ref=cast(temp_ref),
            vmr_ref=cast(vmr_ref),
            gas_names=gas_names,
            idx_h2o=gas_names.index("h2o") + 1,
            flavor=flavor,
            gpoint_flavor=gpoint_flavor,
            gpt2band=gpt2band,
            band_lims_gpt=band_lims_gpt,
            minor_lower=minor_lower,
            minor_upper=minor_upper,
            press_ref_trop_log=press_ref_trop_log,
            press_ref_log_delta=press_ref_log_delta,
            temp_ref_min=temp_ref_min,
            temp_ref_max=temp_ref_max,
            temp_ref_delta=temp_ref_delta,
            press_ref_min=float(press_ref[-1]),
            press_ref_max=float(press_ref[0]),
            totplnk_delta=totplnk_delta,
            band_lims_wvn=band_lims_wvn,
        )
