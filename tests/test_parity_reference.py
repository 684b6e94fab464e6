"""Bit-level parity against the REFERENCE minimal solver binary.

tests/parity/build_oracle.sh compiles /root/reference/src/minimal.cc
unmodified (out-of-tree, Eigen from TensorFlow's bundled headers, ceres
stubbed) into an oracle process; these tests stream identical inputs to the
oracle and to rs_sfm_tpu.solver and diff the outputs.

Covers minimal::getAlpha / getAlphaK (src/minimal.cc:184-198) and
minimal::calculateVelocities for both the constant-velocity and
constant-acceleration (k) models (src/minimal.cc:36-182), over randomized
physically-consistent minimal sets.  scripts/parity_report.py runs the same
harness at 1000 cases and writes the table in PARITY.md.

Conventions bridged (all documented in PARITY.md):
  * the reference's k is the eigenvalue of p·p_k⁻¹ = −(det-polynomial
    root); ours passes compat_negate_k=True here;
  * the null vector e of Z carries a sign ambiguity (SVD convention);
    v is compared after aligning sign(v·v_ref).
"""

import functools
import os
import shutil
import subprocess

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
from rs_sfm_tpu.solver.flow_model import predict_flow
from rs_sfm_tpu.solver.minimal import calculate_velocities

_HERE = os.path.dirname(__file__)
_ORACLE = os.path.join(_HERE, "parity", "build", "rs_oracle")
_REF = os.environ.get("RSSFM_REFERENCE_SRC", "/root/reference/src")

H_IMG = 600.0
F_IMG = 520.0


def _ensure_oracle():
    if os.path.exists(_ORACLE):
        return _ORACLE
    if not os.path.exists(os.path.join(_REF, "minimal.cc")):
        pytest.skip("reference sources not available")
    try:
        subprocess.run(["sh", os.path.join(_HERE, "parity",
                                           "build_oracle.sh")],
                       check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"oracle build failed: {e}")
    return _ORACLE


def _run_oracle(stdin_text):
    out = subprocess.run([_ensure_oracle()], input=stdin_text,
                         capture_output=True, text=True, check=True,
                         timeout=600)
    return out.stdout.strip().splitlines()


def _hex(x):
    return float(x).hex()


@functools.partial(jax.jit, static_argnames=("n",))
def _consistent_batch(px, v, w, rho, k_true, gamma, n=9):
    """Vectorized over cases: flow from the differential RS model with the
    α/α̃ fixed point iterated to convergence (f64)."""

    def one(px_c, v_c, w_c, rho_c, k_c, g_c):
        coords = (px_c - 300.0) / F_IMG

        def body(_, au):
            alpha, alpha_k, _ = au
            u = predict_flow(coords, rho_c, v_c, w_c, k_c, alpha, alpha_k)
            fpy = u[:, 1] * F_IMG / g_c
            return (get_alpha(fpy, H_IMG, g_c),
                    get_alpha_k(px_c[:, 1], fpy, H_IMG, g_c), u)

        alpha, alpha_k, u = jax.lax.fori_loop(
            0, 100, body,
            (jnp.ones(n, px_c.dtype), jnp.zeros(n, px_c.dtype),
             jnp.zeros((n, 2), px_c.dtype)))
        fpy = u[:, 1] * F_IMG / g_c
        return coords, u, alpha, alpha_k, fpy

    return jax.vmap(one)(px, v, w, rho, k_true, gamma)


def make_cases(num_cases, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.uniform(50, 550, size=(num_cases, 9, 2))
    v = rng.uniform(-0.03, 0.03, size=(num_cases, 3))
    w = rng.uniform(-0.01, 0.01, size=(num_cases, 3))
    rho = 1.0 / rng.uniform(3.0, 9.0, size=(num_cases, 9))
    use_k = (np.arange(num_cases) % 2).astype(bool)
    k_true = np.where(use_k, rng.uniform(-0.8, 1.5, size=num_cases), 0.0)
    gamma = rng.uniform(0.3, 1.0, size=num_cases)
    coords, u, alpha, alpha_k, fpy = _consistent_batch(
        jnp.asarray(px, jnp.float64), jnp.asarray(v, jnp.float64),
        jnp.asarray(w, jnp.float64), jnp.asarray(rho, jnp.float64),
        jnp.asarray(k_true, jnp.float64), jnp.asarray(gamma, jnp.float64))
    return dict(px=px, gamma=gamma, use_k=use_k,
                coords=np.asarray(coords), u=np.asarray(u),
                alpha=np.asarray(alpha), alpha_k=np.asarray(alpha_k),
                fpy=np.asarray(fpy))


def run_parity_cases(num_cases, seed=0):
    """Shared harness: returns max |Δ| per output over randomized cases.
    One oracle process serves every case (commands repeat until EOF)."""
    c = make_cases(num_cases, seed)

    # --- single oracle stream: alpha block + vel block per case ---
    text = []
    for i in range(num_cases):
        text.append(f"alpha {H_IMG:g} {_hex(c['gamma'][i])} 9")
        text += [f"{_hex(c['px'][i, j, 1])} {_hex(c['fpy'][i, j])}"
                 for j in range(9)]
        text.append(f"vel {int(c['use_k'][i])} 9")
        text += [" ".join(_hex(x) for x in
                          (c["coords"][i, j, 0], c["coords"][i, j, 1],
                           c["u"][i, j, 0], c["u"][i, j, 1],
                           c["alpha"][i, j], c["alpha_k"][i, j]))
                 for j in range(9)]
    rows = _run_oracle("\n".join(text) + "\n")
    assert len(rows) == num_cases * 10  # 9 alpha rows + 1 vel row per case

    # --- ours, batched (split by static use_k flag) ---
    q_j = jnp.asarray(c["coords"])
    u_j = jnp.asarray(c["u"])
    a_j = jnp.asarray(c["alpha"])
    ak_j = jnp.asarray(c["alpha_k"])
    w_m = np.zeros((num_cases, 3))
    v_m = np.zeros((num_cases, 3))
    k_m = np.zeros(num_cases)
    for flag in (False, True):
        sel = np.where(c["use_k"] == flag)[0]
        if len(sel) == 0:
            continue
        wf, vf, kf = calculate_velocities(q_j[sel], u_j[sel], a_j[sel],
                                          ak_j[sel], bool(flag),
                                          compat_negate_k=True)
        w_m[sel], v_m[sel], k_m[sel] = (np.asarray(wf), np.asarray(vf),
                                        np.asarray(kf))
    a_m = np.asarray(get_alpha(jnp.asarray(c["fpy"]), H_IMG,
                               jnp.asarray(c["gamma"])[:, None]))
    ak_m = np.asarray(get_alpha_k(jnp.asarray(c["px"][:, :, 1]),
                                  jnp.asarray(c["fpy"]), H_IMG,
                                  jnp.asarray(c["gamma"])[:, None]))

    worst = {"alpha": 0.0, "alpha_k": 0.0, "w": 0.0, "v": 0.0, "k": 0.0}
    r = 0
    for i in range(num_cases):
        a_ref = np.array([[float.fromhex(t) for t in rows[r + j].split()]
                          for j in range(9)])
        r += 9
        vals = [float.fromhex(t) for t in rows[r].split()]
        r += 1
        w_o, v_o, k_o = np.array(vals[0:3]), np.array(vals[3:6]), vals[6]
        worst["alpha"] = max(worst["alpha"],
                             float(np.abs(a_ref[:, 0] - a_m[i]).max()))
        worst["alpha_k"] = max(worst["alpha_k"],
                               float(np.abs(a_ref[:, 1] - ak_m[i]).max()))
        s = 1.0 if float(v_m[i] @ v_o) >= 0 else -1.0
        worst["v"] = max(worst["v"], float(np.abs(s * v_m[i] - v_o).max()))
        worst["w"] = max(worst["w"], float(np.abs(w_m[i] - w_o).max()))
        if c["use_k"][i]:
            worst["k"] = max(worst["k"],
                             abs(k_m[i] - k_o) / max(1.0, abs(k_o)))
    return worst


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_reference_parity_minimal_solver():
    worst = run_parity_cases(64, seed=0)
    # α/α̃ are pure arithmetic — bit-exact or one ulp.
    assert worst["alpha"] < 1e-15
    assert worst["alpha_k"] < 1e-15
    # The SVD/eig chains differ (Eigen JacobiSVD vs our Jacobi eigh of
    # ZᵀZ), so agreement is to numerical conditioning, not bitwise.
    assert worst["v"] < 1e-6
    assert worst["w"] < 1e-6
    assert worst["k"] < 1e-6
