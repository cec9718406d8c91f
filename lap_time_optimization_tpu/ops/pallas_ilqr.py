"""Fused Pallas TPU kernel for one AL-iLQR iteration (VMEM-resident).

Replaces the two *serial* pieces of the solve — the Riccati backward
recursion and the line-search forward rollout — with a single Pallas kernel
whose state never leaves VMEM.  The per-stage matrices are tiny (NZ=12,
NU=2), so on the XLA path each of the ~900 sequential steps of a solve pays
op-dispatch/scheduling overhead that dwarfs its arithmetic; fusing the
whole chain into one kernel removes that overhead (the hot-loop latency
roadmap from docs/PERFORMANCE.md; replaces the reference's per-step IPOPT
calls, src/mpc/controller.py:8-34).

Layout notes (TPU v5e, f32):
* The line-search ladder (L step sizes) rides the SUBLANE dimension: one
  (L, NZ) register holds every candidate's state, so the whole ladder
  advances in lockstep through the RK4 chain — data-parallel on the VPU.
* Track-table lookups (k(s), NL(s), NR(s), vref(s)) are evaluated as
  two-hot interpolation weights against a (4, n) VMEM-resident table: a
  masked reduction on (L, n) registers instead of a gather, which the VPU
  vectorizes across the ladder.
* Stage matrices stream from VMEM refs by dynamic slice on the leading
  (horizon) axis inside `fori_loop`s.

Semantics are identical to the XLA path (`mpc/solver._backward_pass` +
`_forward_pass`); parity is asserted in tests/test_pallas_ilqr.py both in
interpreter mode (CPU, exact) and on hardware (f32 tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Must mirror mpc/solver.py constants (imported there; kept standalone here
# to avoid a circular import).
NX = 8
NU = 2
NZ = NX + NU
N_CON = 14

# scalar-parameter vector layout (single (1, NS) VMEM row)
_SCAL_FIELDS = (
    "rho", "reg", "s_max", "inv_ds", "h",  # h = dt / substeps
    "mass", "length_f", "length_r", "rot_inertia",
    "B_f", "C_f", "D_f", "B_r", "C_r", "D_r",
    "C_m", "Cr_0", "Cr_2",
    "q_n", "q_mu", "q_B", "r_delta", "r_throttle", "vref_scale",
    "mu_max", "steer_max", "throttle_max", "dsteer_max", "dthrottle_max",
    "half_len", "half_wid", "lateral_margin",
)
_S = {name: i for i, name in enumerate(_SCAL_FIELDS)}
NS = len(_SCAL_FIELDS)
GRAV = 9.81


def _atan_mosaic(x):
    """Branchless Cephes-style atan (single-precision minimax): Mosaic has
    no atan lowering, so the kernel carries its own.  Max error ~1 ulp f32
    (~1e-7 abs), far below the solver's f32 working precision."""
    dtype = x.dtype
    ax = jnp.abs(x)
    # two-stage range reduction to [0, tan(pi/8)]
    big = ax > 2.414213562373095  # tan(3*pi/8)
    mid = ax > 0.4142135623730951  # tan(pi/8)
    z_big = -1.0 / jnp.where(ax == 0.0, 1.0, ax)
    z_mid = (ax - 1.0) / (ax + 1.0)
    z = jnp.where(big, z_big, jnp.where(mid, z_mid, ax))
    base = jnp.where(
        big,
        jnp.asarray(jnp.pi / 2, dtype),
        jnp.where(mid, jnp.asarray(jnp.pi / 4, dtype), jnp.asarray(0.0, dtype)),
    )
    zz = z * z
    poly = (
        ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz + 1.99777106478e-1) * zz
        - 3.33329491539e-1
    )
    r = base + z + z * zz * poly
    return jnp.sign(x) * r


def _atan2_mosaic(y, x):
    """atan2 from _atan_mosaic with quadrant fixup (x==0 handled)."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = _atan_mosaic(y / safe_x)
    quad = jnp.where(
        x < 0.0,
        jnp.where(y < 0.0, -jnp.pi, jnp.pi).astype(y.dtype),
        jnp.asarray(0.0, y.dtype),
    )
    vertical = jnp.sign(y) * jnp.asarray(jnp.pi / 2, y.dtype)
    return jnp.where(x == 0.0, vertical, base + quad)


# interpret mode uses the exact jnp versions so CPU parity tests are
# bit-comparable to the XLA path; hardware uses the Mosaic-lowerable ones.
_TRIG = {
    True: (jnp.arctan, jnp.arctan2),
    False: (_atan_mosaic, _atan2_mosaic),
}


def _lookup(table_row, s, s_max, inv_ds, n):
    """Piecewise-linear table lookup for a ladder of arc lengths.

    table_row: (1, n); s: (L, 1) wrapped into [0, s_max). Returns (L, 1).
    Two-hot weights w[j] = max(0, 1 - |j - t|) reproduce jnp.interp on the
    uniform grid exactly (matching MPCTrack._uinterp's index arithmetic).
    """
    L = s.shape[0]
    sw = s - jnp.floor(s / s_max) * s_max
    t = jnp.clip(sw * inv_ds, 0.0, n - 1 - 1e-6)  # (L, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, n), 1).astype(s.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j - t))  # (L, n)
    return jnp.sum(w * table_row, axis=1, keepdims=True)  # (L, 1)


def _rhs(z, u, tables, scal, n_table, trig):
    """Curvilinear bicycle RHS for a ladder batch.  z: (L, NZ) augmented
    states (only x-part used), u: (L, NU).  Returns xdot (L, NX).
    Mirrors models/bicycle.BicycleModel.rhs exactly."""
    g = lambda name: scal[0, _S[name]]
    s, n_, mu, vx, vy, r, delta, thr = (z[:, i:i + 1] for i in range(NX))
    k = _lookup(tables[0:1], s, g("s_max"), g("inv_ds"), n_table)
    cos_mu, sin_mu = jnp.cos(mu), jnp.sin(mu)
    sdot = (vx * cos_mu - vy * sin_mu) / (1.0 - n_ * k)
    lf, lr = g("length_f"), g("length_r")
    atan, atan2 = trig
    alpha_f = atan2(vy + lf * r, vx) - delta
    alpha_r = atan2(vy - lr * r, vx)
    wheelbase = lf + lr
    m = g("mass")
    Fn_f = lr * m * GRAV / wheelbase
    Fn_r = lf * m * GRAV / wheelbase
    Fy_f = -Fn_f * g("D_f") * jnp.sin(g("C_f") * atan(g("B_f") * alpha_f))
    Fy_r = -Fn_r * g("D_r") * jnp.sin(g("C_r") * atan(g("B_r") * alpha_r))
    Fx = g("C_m") * thr - g("Cr_0") - g("Cr_2") * vx * vx
    cos_d, sin_d = jnp.cos(delta), jnp.sin(delta)
    return jnp.concatenate(
        [
            sdot,
            vx * sin_mu + vy * cos_mu,
            r - k * sdot,
            (Fx - Fy_f * sin_d + m * vy * r) / m,
            (Fy_r + Fy_f * cos_d - m * vx * r) / m,
            (Fy_f * lf * cos_d - Fy_r * lr) / g("rot_inertia"),
            u[:, 0:1],
            u[:, 1:2],
        ],
        axis=1,
    )


def _dyn_step(z, u, tables, scal, n_table, substeps, trig):
    """Augmented RK4 step for the ladder: z'(x) integrates, u_prev := u."""
    h = scal[0, _S["h"]]

    x = z[:, :NX]
    for _ in range(substeps):
        zx = lambda xx: jnp.concatenate([xx, z[:, NX:]], axis=1)
        k1 = _rhs(zx(x), u, tables, scal, n_table, trig)
        k2 = _rhs(zx(x + 0.5 * h * k1), u, tables, scal, n_table, trig)
        k3 = _rhs(zx(x + 0.5 * h * k2), u, tables, scal, n_table, trig)
        k4 = _rhs(zx(x + h * k3), u, tables, scal, n_table, trig)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return jnp.concatenate([x, u], axis=1)


def _constraints(z, u, tables, scal, n_table, n_con, trig):
    """Stage inequalities for the ladder (L, n_con), solver-tightened
    lateral band (mirrors mpc/solver.tightened_constraints).  n_con=14 is
    the reference box/band set; n_con=16 appends the two normalized
    friction-ellipse rows (models/bicycle.traction_ellipse_physical)."""
    g = lambda name: scal[0, _S[name]]
    s, n_, mu = z[:, 0:1], z[:, 1:2], z[:, 2:3]
    vx, delta, thr = z[:, 3:4], z[:, 6:7], z[:, 7:8]
    nl = _lookup(tables[1:2], s, g("s_max"), g("inv_ds"), n_table)
    nr = _lookup(tables[2:3], s, g("s_max"), g("inv_ds"), n_table)
    lon = g("half_len") * jnp.sin(jnp.abs(mu))
    lat = g("half_wid") * jnp.cos(mu)
    margin = g("lateral_margin")
    left = n_ - lon + lat - nl + margin
    right = -n_ + lon + lat - nr + margin
    rows = [
        left,
        right,
        -s,
        mu - g("mu_max"),
        -mu - g("mu_max"),
        -vx,
        delta - g("steer_max"),
        -delta - g("steer_max"),
        thr - g("throttle_max"),
        -thr - g("throttle_max"),
        u[:, 0:1] - g("dsteer_max"),
        -u[:, 0:1] - g("dsteer_max"),
        u[:, 1:2] - g("dthrottle_max"),
        -u[:, 1:2] - g("dthrottle_max"),
    ]
    if n_con == N_CON + 2:
        vy, r = z[:, 4:5], z[:, 5:6]
        atan, atan2 = trig
        lf, lr = g("length_f"), g("length_r")
        m = g("mass")
        wheelbase = lf + lr
        Fn_f = lr * m * GRAV / wheelbase
        Fn_r = lf * m * GRAV / wheelbase
        alpha_f = atan2(vy + lf * r, vx) - delta
        alpha_r = atan2(vy - lr * r, vx)
        Fy_f = -Fn_f * g("D_f") * jnp.sin(g("C_f") * atan(g("B_f") * alpha_f))
        Fy_r = -Fn_r * g("D_r") * jnp.sin(g("C_r") * atan(g("B_r") * alpha_r))
        longf = 0.5 * g("C_m") * thr
        cap_f = (g("D_f") * Fn_f) ** 2
        cap_r = (g("D_r") * Fn_r) ** 2
        rows.append((longf**2 + Fy_f**2 - cap_f) / cap_f)
        rows.append((longf**2 + Fy_r**2 - cap_r) / cap_r)
    elif n_con != N_CON:  # pragma: no cover
        raise ValueError(f"unsupported constraint count {n_con}")
    return jnp.concatenate(rows, axis=1)


def _al_stage_cost(z, u, lam_row, tables, scal, n_table, n_con, trig):
    """AL stage cost for the ladder (L, 1).  lam_row: (1, n_con)."""
    g = lambda name: scal[0, _S[name]]
    s, n_, mu = z[:, 0:1], z[:, 1:2], z[:, 2:3]
    vx, vy = z[:, 3:4], z[:, 4:5]
    delta = z[:, 6:7]
    vref = _lookup(tables[3:4], s, g("s_max"), g("inv_ds"), n_table)
    atan, _ = trig
    b_dyn = atan(vy / jnp.maximum(vx, 1e-3))
    b_kin = atan(delta * g("length_r") / (g("length_f") + g("length_r")))
    du = u - z[:, NX:]
    lterm = (
        g("q_n") * n_**2
        + g("q_mu") * mu**2
        + vy**2
        + (vx - g("vref_scale") * vref) ** 2
        + g("q_B") * (b_dyn - b_kin) ** 2
        + g("r_delta") * du[:, 0:1] ** 2
        + g("r_throttle") * du[:, 1:2] ** 2
    )
    gc = _constraints(z, u, tables, scal, n_table, n_con, trig)  # (L, n_con)
    rho = g("rho")
    shifted = jnp.maximum(0.0, lam_row + rho * gc)
    pen = jnp.sum((shifted**2 - lam_row**2) / (2.0 * rho), axis=1, keepdims=True)
    return lterm + pen


def _al_terminal_cost(z, lam_row, tables, scal, n_table, n_con, trig):
    g = lambda name: scal[0, _S[name]]
    n_, mu, vy = z[:, 1:2], z[:, 2:3], z[:, 4:5]
    mterm = g("q_n") * n_**2 + g("q_mu") * mu**2 + vy**2
    gc = _constraints(z, jnp.zeros((z.shape[0], NU), z.dtype), tables, scal, n_table, n_con, trig)
    # state-only rows at the terminal stage: box/band rows 0-9 plus the
    # ellipse rows 14+ (mirrors mpc/solver._state_row_mask)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_con), 1)
    mask = ((idx < 10) | (idx >= N_CON)).astype(z.dtype)
    gc = gc * mask + (mask - 1.0)  # inactive rows -> -1
    rho = g("rho")
    shifted = jnp.maximum(0.0, lam_row + rho * gc)
    pen = jnp.sum((shifted**2 - lam_row**2) / (2.0 * rho), axis=1, keepdims=True)
    return mterm + pen


def _kernel(
    # inputs
    A_ref,      # (N, NZ, NZ)
    B_ref,      # (N, NZ, NU)
    lz_ref,     # (N, NZ)
    lu_ref,     # (N, NU)
    lzz_ref,    # (N, NZ, NZ)
    luu_ref,    # (N, NU, NU)
    luz_ref,    # (N, NU, NZ)
    Vz_ref,     # (1, NZ)   terminal gradient
    Vzz_ref,    # (NZ, NZ)  terminal Hessian
    zs_ref,     # (N+1, NZ) reference trajectory
    us_ref,     # (N, NU)   reference inputs
    lams_ref,   # (N+1, n_con)
    tables_ref, # (4, n) rows: k, nl, nr, vref
    alphas_ref, # (L, 1) line-search step sizes
    scal_ref,   # (1, NS)
    # outputs
    zs_out,     # (N+1, NZ) best rollout
    us_out,     # (N, NU)
    cost_out,   # (1, 1)
    ok_out,     # (1, 1)  1.0 if backward pass stayed finite
    # scratch
    ks_s,       # (N, NU)
    Ks_s,       # (N, NU, NZ)
    zall_s,     # (N+1, L, NZ)
    uall_s,     # (N, L, NU)
    cacc_s,     # (L, 1) running AL cost per ladder rung
    *,
    N: int,
    L: int,
    n_table: int,
    n_con: int,
    substeps: int,
    exact_trig: bool,
):
    dtype = zs_ref.dtype
    scal = scal_ref[:]
    tables = tables_ref[:]
    reg = scal[0, _S["reg"]]
    trig = _TRIG[exact_trig]

    # ---------------------------------------------------------------- Riccati
    def bwd_body(i, carry):
        Vz, Vzz, ok = carry  # (1, NZ), (NZ, NZ), scalar
        k = N - 1 - i
        A = A_ref[pl.ds(k, 1)][0]      # (NZ, NZ)
        Bm = B_ref[pl.ds(k, 1)][0]     # (NZ, NU)
        lz = lz_ref[pl.ds(k, 1)]       # (1, NZ)
        lu = lu_ref[pl.ds(k, 1)]       # (1, NU)
        lzz = lzz_ref[pl.ds(k, 1)][0]
        luu = luu_ref[pl.ds(k, 1)][0]
        luz = luz_ref[pl.ds(k, 1)][0]

        # HIGHEST: Mosaic's default f32 matmul truncates inputs to bf16
        # (observed as 1/128-quantized trajectories); the Riccati recursion
        # needs full f32.
        dot = functools.partial(
            jnp.dot, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST
        )
        VzA = dot(Vz, A)               # (1, NZ)
        VzB = dot(Vz, Bm)              # (1, NU)
        VzzA = dot(Vzz, A)             # (NZ, NZ)
        Qz = lz + VzA
        Qu = lu + VzB
        Qzz = lzz + dot(A.T, VzzA)
        Quu = luu + dot(Bm.T, dot(Vzz, Bm))
        Quz = luz + dot(Bm.T, VzzA)

        a = Quu[0, 0] + reg
        b = Quu[0, 1]
        c = Quu[1, 0]
        d = Quu[1, 1] + reg
        det = a * d - b * c
        inv = jnp.concatenate(
            [
                jnp.concatenate([d[None, None], -b[None, None]], axis=1),
                jnp.concatenate([-c[None, None], a[None, None]], axis=1),
            ],
            axis=0,
        ) / det                         # (NU, NU)
        rhs = jnp.concatenate([Qu.T, Quz], axis=1)  # (NU, 1+NZ)
        kK = dot(inv, rhs)
        k_k = -kK[:, 0:1].T             # (1, NU)
        K_k = -kK[:, 1:]                # (NU, NZ)

        ks_s[pl.ds(k, 1)] = k_k
        Ks_s[pl.ds(k, 1)] = K_k[None]

        KT_Quu = dot(K_k.T, Quu)        # (NZ, NU)
        Vz_new = Qz + dot(k_k, KT_Quu.T) + dot(Qu, K_k) + dot(k_k, Quz)
        Vzz_new = Qzz + dot(KT_Quu, K_k) + dot(K_k.T, Quz) + dot(Quz.T, K_k)
        Vzz_new = 0.5 * (Vzz_new + Vzz_new.T)
        ok = ok * jnp.where(jnp.all(jnp.isfinite(k_k)), 1.0, 0.0).astype(dtype)
        return Vz_new, Vzz_new, ok

    Vz0 = Vz_ref[:]
    Vzz0 = Vzz_ref[:]
    _, _, ok = jax.lax.fori_loop(
        0, N, bwd_body, (Vz0, Vzz0, jnp.asarray(1.0, dtype))
    )
    ok_out[:] = ok.reshape(1, 1)

    # ------------------------------------------------------- forward rollout
    alphas = alphas_ref[:]  # (L, 1)
    z0 = zs_ref[pl.ds(0, 1)]                    # (1, NZ)
    z = jnp.broadcast_to(z0, (L, NZ)) + jnp.zeros((L, NZ), dtype)
    zall_s[pl.ds(0, 1)] = z[None]
    cacc_s[:] = jnp.zeros((L, 1), dtype)

    def fwd_body(k, z):
        z_ref_k = zs_ref[pl.ds(k, 1)]           # (1, NZ)
        u_ref_k = us_ref[pl.ds(k, 1)]           # (1, NU)
        k_k = ks_s[pl.ds(k, 1)]                 # (1, NU)
        K_k = Ks_s[pl.ds(k, 1)][0]              # (NU, NZ)
        lam_k = lams_ref[pl.ds(k, 1)]           # (1, N_CON)
        dz = z - z_ref_k                        # (L, NZ)
        u = u_ref_k + alphas * k_k + jnp.dot(
            dz, K_k.T, preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )                                       # (L, NU)
        cacc_s[:] += _al_stage_cost(z, u, lam_k, tables, scal, n_table, n_con, trig)
        z_next = _dyn_step(z, u, tables, scal, n_table, substeps, trig)
        uall_s[pl.ds(k, 1)] = u[None]
        zall_s[pl.ds(k + 1, 1)] = z_next[None]
        return z_next

    z_fin = jax.lax.fori_loop(0, N, fwd_body, z)
    lam_T = lams_ref[pl.ds(N, 1)]
    costs = cacc_s[:] + _al_terminal_cost(z_fin, lam_T, tables, scal, n_table, n_con, trig)  # (L, 1)

    # ------------------------------------------------- pick the best rung
    costs_row = costs[:, 0][None, :]            # (1, L)
    costs_row = jnp.where(jnp.isfinite(costs_row), costs_row, jnp.inf)
    best_cost = jnp.min(costs_row, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    best_idx = jnp.min(
        jnp.where(costs_row == best_cost, lane, jnp.int32(L)), axis=1, keepdims=True
    )
    onehot = (lane == best_idx).astype(dtype)   # (1, L)
    cost_out[:] = best_cost

    def select_body(k, _):
        # elementwise masked reduction, NOT a dot: MXU matmuls would round
        # the selected trajectory through bf16
        zk = zall_s[pl.ds(k, 1)][0]             # (L, NZ)
        zs_out[pl.ds(k, 1)] = jnp.sum(onehot.T * zk, axis=0, keepdims=True)

        @pl.when(k < N)
        def _():
            uk = uall_s[pl.ds(k, 1)][0]         # (L, NU)
            us_out[pl.ds(k, 1)] = jnp.sum(onehot.T * uk, axis=0, keepdims=True)

        return 0

    jax.lax.fori_loop(0, N + 1, select_body, 0)


def scal_vector(model, p, cfg, rho, reg, dtype):
    """Pack model/OCP scalars into the kernel's (1, NS) parameter row."""
    veh = model.vehicle
    track = model.track
    n = track.s_grid.shape[0]
    margin = p.lateral_margin
    if margin is None:
        margin = 0.0
    vals = {
        "rho": rho,
        "reg": reg,
        "s_max": track.s_max,
        "inv_ds": (n - 1) / track.s_max,
        "h": cfg.dt / cfg.substeps,
        "mass": veh.mass,
        "length_f": veh.length_f,
        "length_r": veh.length_r,
        "rot_inertia": veh.rotational_inertia,
        "B_f": veh.B_f, "C_f": veh.C_f, "D_f": veh.D_f,
        "B_r": veh.B_r, "C_r": veh.C_r, "D_r": veh.D_r,
        "C_m": veh.C_m, "Cr_0": veh.Cr_0, "Cr_2": veh.Cr_2,
        "q_n": p.q_n, "q_mu": p.q_mu, "q_B": p.q_B,
        "r_delta": p.r_delta, "r_throttle": p.r_throttle,
        "vref_scale": p.vref_scale,
        "mu_max": p.mu_max, "steer_max": p.steer_max,
        "throttle_max": p.throttle_max,
        "dsteer_max": p.dsteer_max, "dthrottle_max": p.dthrottle_max,
        "half_len": 0.5 * (veh.length_f + veh.length_r),
        "half_wid": 0.5 * veh.width,
        "lateral_margin": margin,
    }
    row = jnp.stack([jnp.asarray(vals[f], dtype) for f in _SCAL_FIELDS])
    return row[None, :]


def tables_matrix(model, dtype):
    """(4, n) stacked lookup tables: k, dist_left, dist_right, vref."""
    t = model.track
    return jnp.stack([t.k_vals, t.nl_vals, t.nr_vals, t.vref_vals]).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("N", "L", "substeps", "interpret"),
)
def backward_forward(
    A, B, lz, lu, lzz, luu, luz, Vz, Vzz,
    zs, us, lams, tables, alphas, scal,
    *, N: int, L: int, substeps: int, interpret: bool = False,
):
    """One fused iLQR iteration: Riccati backward + L-rung line-search
    rollout.  Returns (zs_new (N+1,NZ), us_new (N,NU), cost (scalar),
    ok (scalar 1.0/0.0)).  The constraint count (14 or 16 with the
    friction-ellipse rows) is taken from the multiplier buffer shape."""
    dtype = zs.dtype
    n_table = tables.shape[1]
    kernel = functools.partial(
        _kernel, N=N, L=L, n_table=n_table, n_con=lams.shape[1],
        substeps=substeps, exact_trig=interpret,
    )
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, NZ), dtype),
        jax.ShapeDtypeStruct((N, NU), dtype),
        jax.ShapeDtypeStruct((1, 1), dtype),
        jax.ShapeDtypeStruct((1, 1), dtype),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY if interpret else pltpu.MemorySpace.VMEM)
    zs_new, us_new, cost, ok = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 15,
        out_specs=(vspec, vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((N, NU), dtype),
            pltpu.VMEM((N, NU, NZ), dtype),
            pltpu.VMEM((N + 1, L, NZ), dtype),
            pltpu.VMEM((N, L, NU), dtype),
            pltpu.VMEM((L, 1), dtype),
        ],
        interpret=interpret,
    )(
        A, B, lz, lu, lzz, luu, luz, Vz[None, :], Vzz,
        zs, us, lams, tables, alphas[:, None], scal,
    )
    return zs_new, us_new, cost[0, 0], ok[0, 0]
