"""Batch-parallel fused Pallas TPU kernel for one AL-iLQR iteration.

`ops/pallas_ilqr.py` fuses ONE solve's Riccati backward pass + line-search
rollout into a VMEM-resident kernel; vmapping that kernel serializes the
batch through one program (measured round 2: 917 vs 1,528+ solves/s at
B=32), so the serving path `mpc/runner.closed_loop_batch` had to fall back
to the XLA scan backend (4,159 solves/s/chip at B=128).  This kernel keeps
the fused-kernel latency win AND the batch throughput by putting the batch
where the TPU wants data parallelism:

* **Batch rides the LANE dimension** (128 lanes = the natural B).  Every
  per-stage Riccati matrix is stored flattened as rows × lanes:
  A[k] ∈ (NZ·NZ, B) with row i·NZ+j holding A[i,j] for all B instances.
  The tiny (12×12) matmuls that starve the MXU become unrolled
  row-broadcast FMAs on the VPU — each (NZ, B) op uses all 128 lanes, so
  the whole batch advances through the serial recursion in lockstep.
* **The line-search ladder rides the leading axis** of rank-3 registers
  (L, NZ, B): all L step sizes × B instances integrate the RK4 chain
  together, exactly like the single-instance kernel's (L, NZ) layout.
* **Track tables are pre-windowed per instance** (W samples around each
  instance's current arc length, gathered in XLA where gather is cheap).
  In-kernel lookups are two-hot reductions over (L, W, B) instead of
  (L, n≈846, B) — the window is what makes the batched lookup affordable,
  and a horizon only travels ~15 m while the window spans ~65 m.
* **No ladder trajectory storage**: the ladder pass only accumulates AL
  costs; after the per-instance argmin the winning step size is re-rolled
  once (1/L of the ladder cost) and streamed to the outputs.  This keeps
  every buffer rank-3 and scratch-free.

Semantics match `mpc/solver._backward_pass` + `_forward_pass` per batch
element (modulo the XLA path's per-stage Vzz symmetrization, a float
rounding-order detail); parity is asserted in tests/test_pallas_ilqr.py
against the vmapped XLA path in interpreter mode and on hardware.

Replaces the reference's one-IPOPT-process-per-simulation serving model
(reference src/mpc.py:140-153) for fleet/scenario workloads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lap_time_optimization_tpu.ops.pallas_ilqr import (
    _S,
    _TRIG,
    GRAV,
    N_CON,
    NS,
    NU,
    NX,
    NZ,
)

#: windowed-table length (samples; ds ≈ 1 m on the reference artifacts) and
#: how many samples the window starts BEHIND the instance's current s.  A
#: 1 s horizon at vx ≤ 20 m/s travels ≤ ~20 m; 64 − 16 = 48 samples of
#: lookahead keeps every sane rollout strictly in-window (out-of-window
#: rollouts clamp at the edge — they are diverged candidates the line
#: search discards anyway).
WINDOW = 64
MARGIN = 16


# ---------------------------------------------------------------- flat math
def _bmm3(Af, Bf, M, K, Nn, a_t=False):
    """Batched matmul on flattened (1, rows, B) slabs.

    C[i·Nn+j, b] = Σ_k A[i,k][b] · B[k·Nn+j, b], with A stored row-major
    (1, M·K, B), or column-major (1, K·M, B) when a_t (i.e. Aᵀ is applied).
    Unrolled into M·K row-broadcast FMAs of (Nn, B) — pure VPU work with
    every lane busy.
    """
    blocks = []
    for i in range(M):
        acc = None
        for k in range(K):
            r = (k * M + i) if a_t else (i * K + k)
            term = Af[:, r:r + 1, :] * Bf[:, k * Nn:(k + 1) * Nn, :]
            acc = term if acc is None else acc + term
        blocks.append(acc)
    return jnp.concatenate(blocks, axis=1)


def _vecmat3(vf, Mf, K, Nn):
    """out[j, b] = Σ_k v[k, b] · M[k·Nn+j, b]; vf (1, K, B), Mf (1, K·Nn, B)."""
    acc = None
    for k in range(K):
        term = vf[:, k:k + 1, :] * Mf[:, k * Nn:(k + 1) * Nn, :]
        acc = term if acc is None else acc + term
    return acc


# ------------------------------------------------------------ model physics
def _lookup_b(tab_slab, s, s0, s_max, inv_ds, W):
    """Windowed piecewise-linear lookup.  tab_slab (1, W, B), s (L, 1, B),
    s0 (1, 1, B) window start arc length.  Returns (L, 1, B).  Exactly
    MPCTrack._uinterp for in-window s (the table is periodic in s_max, and
    the window was gathered modulo the lap)."""
    L = s.shape[0]
    B = s.shape[2]
    off = s - s0
    off = off - jnp.floor(off / s_max) * s_max
    t = jnp.clip(off * inv_ds, 0.0, W - 1 - 1e-6)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, W, B), 1).astype(s.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j - t))  # (L, W, B)
    return jnp.sum(w * tab_slab, axis=1, keepdims=True)


def _rhs_b(z, u, wtab, s0, scal, W, trig):
    """Curvilinear bicycle RHS, (L, NX, B) from z (L, NZ, B), u (L, NU, B).
    Mirrors pallas_ilqr._rhs with the extra batch lane axis."""
    g = lambda name: scal[0, _S[name]]
    ch = lambda i: z[:, i:i + 1, :]
    s, n_, mu, vx, vy, r, delta, thr = (ch(i) for i in range(NX))
    k = _lookup_b(wtab[0:1, :, :], s, s0, g("s_max"), g("inv_ds"), W)
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
            u[:, 0:1, :],
            u[:, 1:2, :],
        ],
        axis=1,
    )


def _dyn_step_b(z, u, wtab, s0, scal, W, substeps, trig):
    h = scal[0, _S["h"]]
    x = z[:, :NX, :]
    u_tail = z[:, NX:, :]
    for _ in range(substeps):
        zx = lambda xx: jnp.concatenate([xx, u_tail], axis=1)
        k1 = _rhs_b(zx(x), u, wtab, s0, scal, W, trig)
        k2 = _rhs_b(zx(x + 0.5 * h * k1), u, wtab, s0, scal, W, trig)
        k3 = _rhs_b(zx(x + 0.5 * h * k2), u, wtab, s0, scal, W, trig)
        k4 = _rhs_b(zx(x + h * k3), u, wtab, s0, scal, W, trig)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return jnp.concatenate([x, u], axis=1)


def _constraints_b(z, u, wtab, s0, scal, W, n_con, trig):
    """(L, n_con, B) stage inequalities, solver-tightened lateral band."""
    g = lambda name: scal[0, _S[name]]
    s, n_, mu = z[:, 0:1, :], z[:, 1:2, :], z[:, 2:3, :]
    vx, delta, thr = z[:, 3:4, :], z[:, 6:7, :], z[:, 7:8, :]
    nl = _lookup_b(wtab[1:2, :, :], s, s0, g("s_max"), g("inv_ds"), W)
    nr = _lookup_b(wtab[2:3, :, :], s, s0, g("s_max"), g("inv_ds"), W)
    lon = g("half_len") * jnp.sin(jnp.abs(mu))
    lat = g("half_wid") * jnp.cos(mu)
    margin = g("lateral_margin")
    rows = [
        n_ - lon + lat - nl + margin,
        -n_ + lon + lat - nr + margin,
        -s,
        mu - g("mu_max"),
        -mu - g("mu_max"),
        -vx,
        delta - g("steer_max"),
        -delta - g("steer_max"),
        thr - g("throttle_max"),
        -thr - g("throttle_max"),
        u[:, 0:1, :] - g("dsteer_max"),
        -u[:, 0:1, :] - g("dsteer_max"),
        u[:, 1:2, :] - g("dthrottle_max"),
        -u[:, 1:2, :] - g("dthrottle_max"),
    ]
    if n_con == N_CON + 2:
        vy, r = z[:, 4:5, :], z[:, 5:6, :]
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


def _al_stage_cost_b(z, u, lam_slab, wtab, s0, scal, W, n_con, trig):
    """(L, 1, B) AL stage cost; lam_slab (1, n_con, B)."""
    g = lambda name: scal[0, _S[name]]
    n_, mu = z[:, 1:2, :], z[:, 2:3, :]
    vx, vy = z[:, 3:4, :], z[:, 4:5, :]
    delta = z[:, 6:7, :]
    vref = _lookup_b(wtab[3:4, :, :], z[:, 0:1, :], s0, g("s_max"), g("inv_ds"), W)
    atan, _ = trig
    b_dyn = atan(vy / jnp.maximum(vx, 1e-3))
    b_kin = atan(delta * g("length_r") / (g("length_f") + g("length_r")))
    du = u - z[:, NX:, :]
    lterm = (
        g("q_n") * n_**2
        + g("q_mu") * mu**2
        + vy**2
        + (vx - g("vref_scale") * vref) ** 2
        + g("q_B") * (b_dyn - b_kin) ** 2
        + g("r_delta") * du[:, 0:1, :] ** 2
        + g("r_throttle") * du[:, 1:2, :] ** 2
    )
    gc = _constraints_b(z, u, wtab, s0, scal, W, n_con, trig)
    rho = g("rho")
    shifted = jnp.maximum(0.0, lam_slab + rho * gc)
    pen = jnp.sum((shifted**2 - lam_slab**2) / (2.0 * rho), axis=1, keepdims=True)
    return lterm + pen


def _al_terminal_cost_b(z, lam_slab, wtab, s0, scal, W, n_con, trig):
    g = lambda name: scal[0, _S[name]]
    n_, mu, vy = z[:, 1:2, :], z[:, 2:3, :], z[:, 4:5, :]
    mterm = g("q_n") * n_**2 + g("q_mu") * mu**2 + vy**2
    L, B = z.shape[0], z.shape[2]
    gc = _constraints_b(
        z, jnp.zeros((L, NU, B), z.dtype), wtab, s0, scal, W, n_con, trig
    )
    idx = jax.lax.broadcasted_iota(jnp.int32, (L, n_con, B), 1)
    mask = ((idx < 10) | (idx >= N_CON)).astype(z.dtype)
    gc = gc * mask + (mask - 1.0)
    rho = g("rho")
    shifted = jnp.maximum(0.0, lam_slab + rho * gc)
    pen = jnp.sum((shifted**2 - lam_slab**2) / (2.0 * rho), axis=1, keepdims=True)
    return mterm + pen


# ---------------------------------------------------------------- the kernel
def _kernel(
    # inputs (flattened, batch on lanes)
    A_ref,      # (N, NZ*NZ, B)   A[k] row i*NZ+j
    B_ref,      # (N, NZ*NU, B)   B[k] row i*NU+j
    lz_ref,     # (N, NZ, B)
    lu_ref,     # (N, NU, B)
    lzz_ref,    # (N, NZ*NZ, B)
    luu_ref,    # (N, NU*NU, B)
    luz_ref,    # (N, NU*NZ, B)
    Vz_ref,     # (1, NZ, B)      terminal gradient
    Vzz_ref,    # (1, NZ*NZ, B)   terminal Hessian
    zs_ref,     # (N+1, NZ, B)    reference trajectory
    us_ref,     # (N, NU, B)      reference inputs
    lams_ref,   # (N+1, n_con, B)
    wtab_ref,   # (4, W, B)       windowed tables: k, nl, nr, vref
    s0_ref,     # (1, 1, B)       window start arc length
    reg_ref,    # (1, 1, B)       per-instance Levenberg regularization
    alphas_ref, # (L, 1, 1)       line-search ladder
    scal_ref,   # (1, NS)         shared scalars (incl. rho)
    # outputs
    zs_out,     # (N+1, NZ, B)
    us_out,     # (N, NU, B)
    cost_out,   # (1, 1, B)
    ok_out,     # (1, 1, B)
    # scratch
    ks_s,       # (N, NU, B)
    Ks_s,       # (N, NU*NZ, B)
    *,
    N: int,
    L: int,
    W: int,
    n_con: int,
    substeps: int,
    exact_trig: bool,
):
    dtype = zs_ref.dtype
    scal = scal_ref[:]
    wtab = wtab_ref[:]
    s0 = s0_ref[:]
    reg = reg_ref[:]
    trig = _TRIG[exact_trig]

    # ---------------------------------------------------------------- Riccati
    def bwd_body(i, carry):
        Vz, Vzz, ok = carry  # (1, NZ, B), (1, NZ*NZ, B), (1, 1, B)
        k = N - 1 - i
        A = A_ref[pl.ds(k, 1)]
        Bm = B_ref[pl.ds(k, 1)]
        lz = lz_ref[pl.ds(k, 1)]
        lu = lu_ref[pl.ds(k, 1)]
        lzz = lzz_ref[pl.ds(k, 1)]
        luu = luu_ref[pl.ds(k, 1)]
        luz = luz_ref[pl.ds(k, 1)]

        W1 = _bmm3(Vzz, A, NZ, NZ, NZ)                 # Vzz @ A
        Qz = lz + _vecmat3(Vz, A, NZ, NZ)
        Qu = lu + _vecmat3(Vz, Bm, NZ, NU)
        Qzz = lzz + _bmm3(A, W1, NZ, NZ, NZ, a_t=True)  # Aᵀ (Vzz A)
        W2 = _bmm3(Vzz, Bm, NZ, NZ, NU)                # Vzz @ B
        Quu = luu + _bmm3(Bm, W2, NU, NZ, NU, a_t=True)
        Quz = luz + _bmm3(Bm, W1, NU, NZ, NZ, a_t=True)

        # 2×2 control-Hessian solve in closed form, per lane
        a = Quu[:, 0:1, :] + reg
        b = Quu[:, 1:2, :]
        c = Quu[:, 2:3, :]
        d = Quu[:, 3:4, :] + reg
        det = a * d - b * c
        rhs0 = jnp.concatenate([Qu[:, 0:1, :], Quz[:, 0:NZ, :]], axis=1)
        rhs1 = jnp.concatenate([Qu[:, 1:2, :], Quz[:, NZ:2 * NZ, :]], axis=1)
        kK0 = (d * rhs0 - b * rhs1) / det              # (1, 1+NZ, B)
        kK1 = (a * rhs1 - c * rhs0) / det
        k_k = -jnp.concatenate([kK0[:, 0:1, :], kK1[:, 0:1, :]], axis=1)
        K_k = -jnp.concatenate([kK0[:, 1:, :], kK1[:, 1:, :]], axis=1)  # (1, NU*NZ, B)

        ks_s[pl.ds(k, 1)] = k_k
        Ks_s[pl.ds(k, 1)] = K_k

        Quuk = _bmm3(Quu, k_k, NU, NU, 1)              # (1, NU, B)
        w = Quuk + Qu
        Vz_new = Qz + _bmm3(K_k, w, NZ, NU, 1, a_t=True) + _bmm3(
            Quz, k_k, NZ, NU, 1, a_t=True
        )
        QuuK = _bmm3(Quu, K_k, NU, NU, NZ)             # (1, NU*NZ, B)
        Vzz_new = (
            Qzz
            + _bmm3(K_k, QuuK, NZ, NU, NZ, a_t=True)
            + _bmm3(K_k, Quz, NZ, NU, NZ, a_t=True)
            + _bmm3(Quz, K_k, NZ, NU, NZ, a_t=True)
        )
        fin = jnp.min(jnp.isfinite(k_k).astype(dtype), axis=1, keepdims=True)
        return Vz_new, Vzz_new, ok * fin

    _, _, ok = jax.lax.fori_loop(
        0, N, bwd_body,
        (Vz_ref[:], Vzz_ref[:], jnp.ones((1, 1, zs_ref.shape[2]), dtype)),
    )
    ok_out[:] = ok

    # ------------------------------------------------ ladder pass (costs only)
    B = zs_ref.shape[2]
    alphas = alphas_ref[:]                             # (L, 1, 1)
    z0 = zs_ref[pl.ds(0, 1)]                           # (1, NZ, B)
    z = jnp.broadcast_to(z0, (L, NZ, B)) + jnp.zeros((L, NZ, B), dtype)

    def ladder_body(k, carry):
        z, cacc = carry
        z_ref_k = zs_ref[pl.ds(k, 1)]                  # (1, NZ, B)
        u_ref_k = us_ref[pl.ds(k, 1)]                  # (1, NU, B)
        k_k = ks_s[pl.ds(k, 1)]                        # (1, NU, B)
        K_k = Ks_s[pl.ds(k, 1)]                        # (1, NU*NZ, B)
        lam_k = lams_ref[pl.ds(k, 1)]                  # (1, n_con, B)
        dz = z - z_ref_k                               # (L, NZ, B)
        fb = []
        for i in range(NU):
            acc = None
            for j in range(NZ):
                term = K_k[:, i * NZ + j:i * NZ + j + 1, :] * dz[:, j:j + 1, :]
                acc = term if acc is None else acc + term
            fb.append(acc)
        u = u_ref_k + alphas * k_k + jnp.concatenate(fb, axis=1)  # (L, NU, B)
        cacc = cacc + _al_stage_cost_b(z, u, lam_k, wtab, s0, scal, W, n_con, trig)
        z = _dyn_step_b(z, u, wtab, s0, scal, W, substeps, trig)
        return z, cacc

    z_fin, cacc = jax.lax.fori_loop(
        0, N, ladder_body, (z, jnp.zeros((L, 1, B), dtype))
    )
    lam_T = lams_ref[pl.ds(N, 1)]
    costs = cacc + _al_terminal_cost_b(z_fin, lam_T, wtab, s0, scal, W, n_con, trig)
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)      # (L, 1, B)

    # --------------------------------------------- per-instance rung selection
    best_cost = jnp.min(costs, axis=0, keepdims=True)           # (1, 1, B)
    rung = jax.lax.broadcasted_iota(jnp.int32, (L, 1, B), 0)
    best_idx = jnp.min(
        jnp.where(costs == best_cost, rung, jnp.int32(L)), axis=0, keepdims=True
    )
    onehot = (rung == best_idx).astype(dtype)                   # (L, 1, B)
    alpha_sel = jnp.sum(onehot * alphas, axis=0, keepdims=True)  # (1, 1, B)
    cost_out[:] = best_cost

    # ------------------------------------- re-roll the winning rung, streamed
    z1 = zs_ref[pl.ds(0, 1)]                                    # (1, NZ, B)
    zs_out[pl.ds(0, 1)] = z1

    def reroll_body(k, z):
        z_ref_k = zs_ref[pl.ds(k, 1)]
        u_ref_k = us_ref[pl.ds(k, 1)]
        k_k = ks_s[pl.ds(k, 1)]
        K_k = Ks_s[pl.ds(k, 1)]
        dz = z - z_ref_k
        fb = []
        for i in range(NU):
            acc = None
            for j in range(NZ):
                term = K_k[:, i * NZ + j:i * NZ + j + 1, :] * dz[:, j:j + 1, :]
                acc = term if acc is None else acc + term
            fb.append(acc)
        u = u_ref_k + alpha_sel * k_k + jnp.concatenate(fb, axis=1)
        z_next = _dyn_step_b(z, u, wtab, s0, scal, W, substeps, trig)
        us_out[pl.ds(k, 1)] = u
        zs_out[pl.ds(k + 1, 1)] = z_next
        return z_next

    jax.lax.fori_loop(0, N, reroll_body, z1)


# ------------------------------------------------------------------- wrapper
def window_tables(tables: jax.Array, s0_b: jax.Array, s_max, W: int = WINDOW):
    """Gather per-instance table windows.  tables (4, n) global; s0_b (B,)
    current arc lengths.  Returns (wtab (4, W, B), s0_win (B,)).  The window
    starts MARGIN samples behind each instance and wraps modulo the lap
    (sample n-1 duplicates sample 0, so the period is n-1 samples)."""
    n = tables.shape[1]
    period = n - 1
    ds = s_max / period
    start = jnp.floor(s0_b / ds).astype(jnp.int32) - MARGIN            # (B,)
    idx = jnp.mod(start[:, None] + jnp.arange(W, dtype=jnp.int32), period)
    wtab = jnp.transpose(tables[:, idx], (0, 2, 1))                     # (4, W, B)
    return wtab, start.astype(tables.dtype) * ds


@functools.partial(
    jax.jit,
    static_argnames=("N", "L", "W", "substeps", "interpret"),
)
def backward_forward_batch(
    A, B, lz, lu, lzz, luu, luz, Vz, Vzz,
    zs, us, lams, tables, alphas, scal, reg_b,
    *, N: int, L: int, W: int = WINDOW, substeps: int, interpret: bool = False,
):
    """One fused iLQR iteration for a BATCH of independent OCPs.

    Batch-major inputs (Bt leading): A (Bt,N,NZ,NZ), B (Bt,N,NZ,NU),
    lz (Bt,N,NZ), lu (Bt,N,NU), lzz (Bt,N,NZ,NZ), luu (Bt,N,NU,NU),
    luz (Bt,N,NU,NZ), Vz (Bt,NZ), Vzz (Bt,NZ,NZ), zs (Bt,N+1,NZ),
    us (Bt,N,NU), lams (Bt,N+1,n_con), reg_b (Bt,); shared: tables (4,n)
    global lookup tables, alphas (L,), scal (1,NS) from
    pallas_ilqr.scal_vector (its reg slot is ignored — reg is per-instance).

    Returns (zs_new (Bt,N+1,NZ), us_new (Bt,N,NU), cost (Bt,), ok (Bt,)).
    """
    dtype = zs.dtype
    Bt = zs.shape[0]
    n_con = lams.shape[2]

    flat2 = lambda x: jnp.transpose(x, (1, 2, 3, 0)).reshape(x.shape[1], -1, Bt)
    tomajor = lambda x: jnp.transpose(x, (1, 2, 0))
    A_f = flat2(A)
    B_f = flat2(B)
    lzz_f = flat2(lzz)
    luu_f = flat2(luu)
    luz_f = flat2(luz)
    lz_f = tomajor(lz)
    lu_f = tomajor(lu)
    Vz_f = jnp.transpose(Vz, (1, 0))[None]                  # (1, NZ, Bt)
    Vzz_f = jnp.transpose(Vzz, (1, 2, 0)).reshape(1, NZ * NZ, Bt)
    zs_f = tomajor(zs)
    us_f = tomajor(us)
    lams_f = tomajor(lams)

    s_max = scal[0, _S["s_max"]]
    wtab, s0_win = window_tables(tables, zs[:, 0, 0], s_max, W)
    s0_f = s0_win[None, None, :]
    reg_f = reg_b[None, None, :].astype(dtype)
    alphas_f = alphas.astype(dtype)[:, None, None]

    kernel = functools.partial(
        _kernel, N=N, L=L, W=W, n_con=n_con, substeps=substeps,
        exact_trig=interpret,
    )
    out_shape = (
        jax.ShapeDtypeStruct((N + 1, NZ, Bt), dtype),
        jax.ShapeDtypeStruct((N, NU, Bt), dtype),
        jax.ShapeDtypeStruct((1, 1, Bt), dtype),
        jax.ShapeDtypeStruct((1, 1, Bt), dtype),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY if interpret else pltpu.MemorySpace.VMEM)
    zs_new, us_new, cost, ok = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 17,
        out_specs=(vspec, vspec, vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((N, NU, Bt), dtype),
            pltpu.VMEM((N, NU * NZ, Bt), dtype),
        ],
        interpret=interpret,
    )(
        A_f, B_f, lz_f, lu_f, lzz_f, luu_f, luz_f, Vz_f, Vzz_f,
        zs_f, us_f, lams_f, wtab, s0_f, reg_f, alphas_f, scal,
    )
    return (
        jnp.transpose(zs_new, (2, 0, 1)),
        jnp.transpose(us_new, (2, 0, 1)),
        cost[0, 0, :],
        ok[0, 0, :],
    )
