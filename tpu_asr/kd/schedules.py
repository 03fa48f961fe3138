"""Noise schedules for flow-matching KD (reference asr_train.py:790-823).

Each schedule maps t in (0, 1] to (alpha_t, sigma_t); the `_deriv` variants return
the analytic (d alpha/dt, d sigma/dt) used by the FM training loss
x_hat = (dalpha_dt * s_f - velocity) / (-dsigma_dt)  (asr_train.py:1366-1367).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def rectified_flow_schedule(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return t, 1.0 - t


def rectified_flow_schedule_deriv(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.ones_like(t), -jnp.ones_like(t)


def vp_ode_schedule(t: jnp.ndarray, a: float = 19.9, b: float = 0.1):
    alpha_t = jnp.exp(-0.25 * a * (1 - t) ** 2 - 0.5 * b * (1 - t))
    sigma_t = jnp.sqrt(1 - alpha_t ** 2)
    return alpha_t, sigma_t


def vp_ode_schedule_deriv(t: jnp.ndarray, a: float = 19.9, b: float = 0.1):
    alpha_t = jnp.exp(-0.25 * a * (1 - t) ** 2 - 0.5 * b * (1 - t))
    dalpha_dt = alpha_t * (0.5 * a * (1 - t) + 0.5 * b)
    sigma_t = jnp.sqrt(1 - alpha_t ** 2)
    dsigma_dt = -alpha_t * dalpha_dt / sigma_t
    return dalpha_dt, dsigma_dt


def ve_ode_schedule(t: jnp.ndarray, a: float = 0.02, b: float = 100.0):
    alpha_t = a * (b / a) ** t
    sigma_t = jnp.ones_like(t)
    return alpha_t, sigma_t


def ve_ode_schedule_deriv(t: jnp.ndarray, a: float = 0.02, b: float = 100.0):
    alpha_t = a * (b / a) ** t
    dalpha_dt = alpha_t * jnp.log(b / a)
    dsigma_dt = jnp.zeros_like(t)
    return dalpha_dt, dsigma_dt


_SCHEDULES = {
    "rectified": (rectified_flow_schedule, rectified_flow_schedule_deriv),
    "vp_ode": (vp_ode_schedule, vp_ode_schedule_deriv),
    "ve_ode": (ve_ode_schedule, ve_ode_schedule_deriv),
}


def get_noise_schedule(name: str) -> Tuple[Callable, Callable]:
    """Returns (schedule, schedule_deriv) by name."""
    if name not in _SCHEDULES:
        raise NotImplementedError(f"unknown noise schedule: {name}")
    return _SCHEDULES[name]
