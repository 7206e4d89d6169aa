"""Cloud optics lookup tables (reference ``Cloud_optics``,
``include/Cloud_optics.h`` + ``src/Cloud_optics.cpp``)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.pytree import pytree_dataclass
from .. import config

_META = ("radliq_lwr", "radliq_upr", "diamice_lwr", "diamice_upr",
         "liq_nsteps", "ice_nsteps", "liq_step_size", "ice_step_size",
         "band_lims_wvn")


@pytree_dataclass(meta_fields=_META)
class CloudLUT:
    # (nsize, nbnd) tables; ice tables already sliced at roughness icergh=2
    # (src/Cloud_optics.cpp:56-68).
    lut_extliq: object
    lut_ssaliq: object
    lut_asyliq: object
    lut_extice: object
    lut_ssaice: object
    lut_asyice: object

    radliq_lwr: float
    radliq_upr: float
    diamice_lwr: float
    diamice_upr: float
    liq_nsteps: int
    ice_nsteps: int
    liq_step_size: float
    ice_step_size: float
    band_lims_wvn: Tuple[Tuple[float, float], ...]

    @property
    def nbnd(self) -> int:
        return self.lut_extliq.shape[1]

    @staticmethod
    def from_netcdf(path: str, dtype=None) -> "CloudLUT":
        from ..utils.ncio import NcReader

        dtype = dtype or config.FLOAT
        with NcReader(path) as nc:
            radliq_lwr = nc.read_scalar("radliq_lwr")
            radliq_upr = nc.read_scalar("radliq_upr")
            diamice_lwr = nc.read_scalar("diamice_lwr")
            diamice_upr = nc.read_scalar("diamice_upr")
            # File layout (C-order): liquid (nbnd, nsize) -> (nsize, nbnd);
            # ice (nrghice, nbnd, nsize) -> roughness category 2 (index 1).
            extliq = nc.read("lut_extliq").T.astype(dtype)
            ssaliq = nc.read("lut_ssaliq").T.astype(dtype)
            asyliq = nc.read("lut_asyliq").T.astype(dtype)
            extice = nc.read("lut_extice")[1].T.astype(dtype)
            ssaice = nc.read("lut_ssaice")[1].T.astype(dtype)
            asyice = nc.read("lut_asyice")[1].T.astype(dtype)
            blw = nc.read("bnd_limits_wavenumber")

        nliq, nice = extliq.shape[0], extice.shape[0]
        return CloudLUT(
            lut_extliq=extliq, lut_ssaliq=ssaliq, lut_asyliq=asyliq,
            lut_extice=extice, lut_ssaice=ssaice, lut_asyice=asyice,
            radliq_lwr=float(radliq_lwr), radliq_upr=float(radliq_upr),
            diamice_lwr=float(diamice_lwr), diamice_upr=float(diamice_upr),
            liq_nsteps=nliq, ice_nsteps=nice,
            liq_step_size=float((radliq_upr - radliq_lwr) / (nliq - 1)),
            ice_step_size=float((diamice_upr - diamice_lwr) / (nice - 1)),
            band_lims_wvn=tuple((float(a), float(b)) for a, b in np.asarray(blw)),
        )
