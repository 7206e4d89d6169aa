"""Optical-property and source-function containers (pytree dataclasses).

The reference's ``Optical_props_1scl`` / ``Optical_props_2str`` /
``Source_func_lw`` class trees (``include/Optical_props.h:94-162``,
``include/Source_functions.h:35-93``) become frozen pytrees of jnp arrays.
All arrays are 0-based C-order:

* ``tau/ssa/g``:   (ncol, nlay, ngpt)
* ``sfc_src``:     (ncol, ngpt)
* ``lay_src``:     (ncol, nlay, ngpt)
* ``lev_src``:     (ncol, nlay+1, ngpt)
"""

from __future__ import annotations

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class OpticalProps1scl:
    """Absorption-only optical depth (longwave no-scattering path)."""

    tau: object

    @property
    def ncol(self):
        return self.tau.shape[0]

    @property
    def nlay(self):
        return self.tau.shape[1]

    @property
    def ngpt(self):
        return self.tau.shape[2]


@pytree_dataclass
class OpticalProps2str:
    """Two-stream optical properties: optical depth, single-scattering
    albedo, asymmetry parameter."""

    tau: object
    ssa: object
    g: object

    @property
    def ncol(self):
        return self.tau.shape[0]

    @property
    def nlay(self):
        return self.tau.shape[1]

    @property
    def ngpt(self):
        return self.tau.shape[2]


@pytree_dataclass
class SourceFuncLW:
    """Planck source functions for the longwave solver."""

    sfc_src: object      # (ncol, ngpt)
    sfc_src_jac: object  # (ncol, ngpt)
    lay_src: object      # (ncol, nlay, ngpt)
    lev_src: object      # (ncol, nlay+1, ngpt)
