# End-to-end drive through the PUBLIC package boundary: write coefficient
# NetCDF files to disk, load them, run LW+SW radiation on an RCE atmosphere.
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import KDist, CloudLUT
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere
from rte_rrtmgp_tpu.ops import gas_optics as go, rte_lw, rte_sw, fluxes, cloud_optics, optics_ops
import jax.numpy as jnp

synthetic.write_kdist_nc("coef_lw.nc", synthetic.make_kdist_raw(True))
synthetic.write_kdist_nc("coef_sw.nc", synthetic.make_kdist_raw(False))
synthetic.write_cloud_nc("cloud_sw.nc", synthetic.make_cloud_raw(False))
gases = ["h2o","co2","o3","n2o","co","ch4","o2","n2"]
kd_lw = KDist.from_netcdf("coef_lw.nc", gases, dtype=np.float32)
kd_sw = KDist.from_netcdf("coef_sw.nc", gases, dtype=np.float32)
clut = CloudLUT.from_netcdf("cloud_sw.nc", dtype=np.float32)
print(f"LW kdist: {kd_lw.ngpt} gpt / {kd_lw.nbnd} bands, {kd_lw.ngas} gases, {kd_lw.nflav} flavors")
print(f"SW kdist: {kd_sw.ngpt} gpt / {kd_sw.nbnd} bands, TSI={kd_sw.total_solar_irradiance():.1f} W/m2")

atm = make_atmosphere(ncol=24, nlay=72, seed=1)
flip = lambda a: np.ascontiguousarray(a[:, ::-1])
p_lay, t_lay = flip(atm["p_lay"]), flip(atm["t_lay"])
p_lev, t_lev = flip(atm["p_lev"]), flip(atm["t_lev"])
vmr = atm["gas_concs"].materialize(gases, 24, 72)[:, ::-1, :].copy()
f32 = lambda a: jnp.asarray(a, jnp.float32)
col_dry = go.get_col_dry(f32(vmr[:,:,0]), f32(p_lev))

op, src = go.gas_optics_lw(kd_lw, f32(p_lay), f32(p_lev), f32(t_lay), f32(t_lev),
                           f32(atm["t_sfc"]), f32(vmr), col_dry, sfc_lay=71)
emis = jnp.full((24, kd_lw.ngpt), 0.98, jnp.float32)
up, dn, _ = rte_lw.lw_solver_noscat(op.tau, src.lay_src, src.lev_src, emis,
                                    src.sfc_src, src.sfc_src_jac,
                                    jnp.zeros((24, kd_lw.ngpt), jnp.float32))
flux_up = np.asarray(fluxes.sum_broadband(up)); flux_dn = np.asarray(fluxes.sum_broadband(dn))
sigma = 5.670374419e-8; ts = atm["t_sfc"].mean()
print(f"LW: sfc up {flux_up[:, -1].mean():8.2f} W/m2 (sigma*T^4={sigma*ts**4:.1f}), TOA up {flux_up[:, 0].mean():8.2f}, sfc dn {flux_dn[:, -1].mean():8.2f}")
assert 0.5*sigma*ts**4 < flux_up[:, -1].mean() < 1.05*sigma*ts**4
assert flux_up[:, 0].mean() < flux_up[:, -1].mean()

op2, toa = go.gas_optics_sw(kd_sw, f32(p_lay), f32(p_lev), f32(t_lay), f32(vmr), col_dry)
cl = cloud_optics.cloud_optics_2str(clut, f32(flip(atm["lwp"])), f32(flip(atm["iwp"])),
                                    f32(flip(atm["rel"])), f32(flip(atm["dei"])))
cl = optics_ops.delta_scale(cl)
op2 = optics_ops.increment_2str_by_2str_bybnd(op2, cl, kd_sw.gpt2band)
alb = jnp.full((24, kd_sw.ngpt), 0.06, jnp.float32)
su, sd, sdir = rte_sw.sw_solver_2stream(op2.tau, op2.ssa, op2.g, f32(atm["mu0"]),
                                        alb, alb, toa)
su_b = np.asarray(fluxes.sum_broadband(su)); sd_b = np.asarray(fluxes.sum_broadband(sd))
sdir_b = np.asarray(fluxes.sum_broadband(sdir))
toa_in = (np.asarray(toa).sum(-1)*atm["mu0"])
print(f"SW: TOA in {toa_in.mean():8.2f}, TOA up {su_b[:,0].mean():8.2f} (albedo {su_b[:,0].mean()/toa_in.mean():.3f}), sfc dn {sd_b[:,-1].mean():8.2f} (dir {sdir_b[:,-1].mean():.2f})")
assert np.all(su_b[:,0] < toa_in), "reflected exceeds incoming!"
assert np.all(sd_b >= -1e-3)
cloudy = atm["lwp"].sum(1) + atm["iwp"].sum(1) > 0
print(f"cloudy cols sfc dn {sd_b[cloudy,-1].mean():.2f} < clear cols {sd_b[~cloudy,-1].mean():.2f}: {sd_b[cloudy,-1].mean() < sd_b[~cloudy,-1].mean()}")
assert sd_b[cloudy,-1].mean() < sd_b[~cloudy,-1].mean()

try:
    KDist.from_netcdf("coef_lw.nc", ["h2o","co2"])
    print("PROBE FAIL: no error for missing key gas")
except ValueError as e:
    print(f"probe missing-gas: ValueError: {e}")

f = jax.jit(lambda k, p, pl, t, v, cd: go.gas_optics_sw(k, p, pl, t, v, cd)[0].tau)
t1 = f(kd_sw, f32(p_lay), f32(p_lev), f32(t_lay), f32(vmr), col_dry)
t2 = f(kd_sw, f32(p_lay), f32(p_lev), f32(t_lay), f32(vmr), col_dry)
print("probe jit twice: ok, tau max", float(t1.max()))

# 7. the driver layer, spectrally chunked, original (unflipped) orientation
from rte_rrtmgp_tpu.models import RadiationSolverLW, RadiationSolverSW
lw = RadiationSolverLW(kd_lw).solve(
    gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
    t_lay=atm["t_lay"], t_lev=atm["t_lev"], t_sfc=atm["t_sfc"],
    emis_sfc=np.full((24, kd_lw.nbnd), 0.98), gpt_chunk=64, dtype=np.float32)
sw = RadiationSolverSW(kd_sw, clut).solve(
    gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
    t_lay=atm["t_lay"], mu0=atm["mu0"],
    sfc_alb_dir=np.full((24, kd_sw.nbnd), 0.06),
    sfc_alb_dif=np.full((24, kd_sw.nbnd), 0.06),
    lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"], dei=atm["dei"],
    delta_cloud=True, gpt_chunk=56, dtype=np.float32)
lw_up = np.asarray(lw["lw_flux_up"])  # orig orientation: surface at level 0
print(f"driver LW sfc up {lw_up[:,0].mean():8.2f} (matches low-level {flux_up[:,-1].mean():8.2f})")
assert abs(lw_up[:, 0].mean() - flux_up[:, -1].mean()) < 0.5
sw_dn = np.asarray(sw["sw_flux_dn"])
assert np.isfinite(sw_dn).all() and sw_dn.min() >= 0
print(f"driver SW sfc dn {sw_dn[:,0].mean():8.2f} (chunked, cloudy, delta-scaled)")
print("ALL E2E CHECKS PASSED")
