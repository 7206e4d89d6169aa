"""Aerosol optics lookup tables (reference ``Aerosol_optics``,
``include/Aerosol_optics.h`` + ``src/Aerosol_optics.cpp``).

The 11 CAMS/ECMWF aerosol species (SS1-3, DU1-3, OM1-2, BC1-2, SU) with their
hydrophobic-table column or hydrophilic-table species index are encoded as a
static spec so the species loop unrolls at trace time.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from ..utils.pytree import pytree_dataclass
from .. import config


class AerosolSpecies(NamedTuple):
    mmr_name: str     # aermr01 .. aermr11
    philic: bool
    table_idx: int    # 0-based column in phobic/philic table


# Mapping from src/Aerosol_optics.cpp:64-144 (1-based table indices there).
AEROSOL_SPECIES: Tuple[AerosolSpecies, ...] = (
    AerosolSpecies("aermr01", True, 0),    # SS1
    AerosolSpecies("aermr02", True, 1),    # SS2
    AerosolSpecies("aermr03", True, 2),    # SS3
    AerosolSpecies("aermr04", False, 0),   # DU1
    AerosolSpecies("aermr05", False, 7),   # DU2
    AerosolSpecies("aermr06", False, 5),   # DU3
    AerosolSpecies("aermr07", True, 3),    # OM2 (hydrophilic organic)
    AerosolSpecies("aermr08", False, 9),   # OM1 (hydrophobic organic)
    AerosolSpecies("aermr09", False, 10),  # BC1
    AerosolSpecies("aermr10", False, 10),  # BC2
    AerosolSpecies("aermr11", True, 4),    # SU
)


@pytree_dataclass(meta_fields=("nhum",))
class AerosolLUT:
    # (nbnd, nphobic) and (nbnd, nhum, nphilic) tables.
    mext_phobic: object
    ssa_phobic: object
    g_phobic: object
    mext_philic: object
    ssa_philic: object
    g_philic: object
    rh_upper: object  # (nhum,) upper bounds of relative-humidity classes
    nhum: int

    @property
    def nbnd(self) -> int:
        return self.mext_phobic.shape[0]

    @staticmethod
    def from_netcdf(path: str, dtype=None) -> "AerosolLUT":
        from ..utils.ncio import NcReader

        dtype = dtype or config.FLOAT
        with NcReader(path) as nc:
            # File layout C-order: (nphobic, nband) / (nphilic, nhum, nband).
            mext_phobic = nc.read("mass_ext_sw_hydrophobic").T.astype(dtype)
            ssa_phobic = nc.read("ssa_sw_hydrophobic").T.astype(dtype)
            g_phobic = nc.read("asymmetry_sw_hydrophobic").T.astype(dtype)
            mext_philic = np.transpose(nc.read("mass_ext_sw_hydrophilic"),
                                       (2, 1, 0)).astype(dtype)
            ssa_philic = np.transpose(nc.read("ssa_sw_hydrophilic"),
                                      (2, 1, 0)).astype(dtype)
            g_philic = np.transpose(nc.read("asymmetry_sw_hydrophilic"),
                                    (2, 1, 0)).astype(dtype)
            rh_upper = nc.read("relative_humidity2").astype(dtype)
        return AerosolLUT(
            mext_phobic=mext_phobic, ssa_phobic=ssa_phobic, g_phobic=g_phobic,
            mext_philic=mext_philic, ssa_philic=ssa_philic, g_philic=g_philic,
            rh_upper=rh_upper, nhum=int(rh_upper.shape[0]),
        )
