"""Gait scheduling as pure functions of the iteration counter.

Re-derivation of OffsetDurationGait (reference Gait.cpp:5-245) with
fully static shapes: the per-gait (offsets, durations, horizon) triple is
data (`GaitParams`), the MPC contact table is padded to `h_max` rows and
rows >= h are masked to zero (those steps also get zero cost weight in the
QP, so the padded problem is exactly the h-step problem).

Gait numbers (ConvexMPCLocomotion.cpp:27-41, 149-172):
  1 bounding, 2 pronking, 3 jumping(unreachable), 4 standing, 5 trotRunning,
  7 galloping, 8 pacing, 9 trotting (default), 10 walking, 11 walking2.
The adaptive "aio" gait (mode 1) reshapes (h, offsets, durations) by speed
(ConvexMPCLocomotion.cpp:173-236).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from quadruped_ctrl_tpu.core.types import GaitParams

# Static gait table at the default horizon h=14, indexed by gait number 0..11.
# Row = (offsets[4], durations[4]). Gaits 0,3,6 fall back to trotting like the
# reference's pointer default (ConvexMPCLocomotion.cpp:149).
_H = 14
_TROT = ((0, 7, 7, 0), (7, 7, 7, 7))
_GAIT_TABLE = {
    1: ((7, 7, 0, 0), (6, 6, 6, 6)),          # bounding
    2: ((0, 0, 0, 0), (6, 6, 6, 6)),          # pronking
    3: ((0, 0, 0, 0), (3, 3, 3, 3)),          # jumping (defined, unreachable)
    4: ((0, 0, 0, 0), (14, 14, 14, 14)),      # standing
    5: ((0, 7, 7, 0), (6, 6, 6, 6)),          # trot running
    7: ((0, 4, 7, 11), (7, 7, 7, 7)),         # galloping
    8: ((7, 0, 7, 0), (7, 7, 7, 7)),          # pacing
    9: _TROT,                                  # trotting
    10: ((0, 7, 3, 10), (10, 10, 10, 10)),    # walking (h/2, h/4, 3h/4 at h=14)
    11: ((0, 7, 7, 0), (10, 10, 10, 10)),     # walking2
}


def gait_table_arrays():
    """(12,4) offsets, (12,4) durations, (12,) horizons as numpy arrays."""
    offs = np.zeros((12, 4), dtype=np.int32)
    durs = np.zeros((12, 4), dtype=np.int32)
    hs = np.full((12,), _H, dtype=np.int32)
    for g in range(12):
        o, d = _GAIT_TABLE.get(g, _TROT)
        offs[g] = o
        durs[g] = d
    return offs, durs, hs


_OFFS, _DURS, _HS = gait_table_arrays()


def max_simultaneous_stance(gait_numbers) -> int:
    """Worst-case stance feet in any MPC-table step across the given fixed
    gaits (a host-side static property of the offset/duration tables): the
    bound that makes `formation.compress_stance(table, max_stance)` an exact
    swing-variable elimination for a sweep restricted to these gaits.
    Trot/bounding/pacing/galloping/trot-running are 2; walking is 3;
    pronking/standing/walking2 are 4 (no compression win)."""
    worst = 0
    for g in gait_numbers:
        o, d = _GAIT_TABLE.get(int(g), _TROT)
        h = _H
        seg = np.arange(h)[:, None]                       # (h, 1)
        prog = (seg - np.asarray(o)[None, :]) % h
        stance = (prog < np.asarray(d)[None, :]).sum(axis=1)
        worst = max(worst, int(stance.max()))
    return worst


def params_for_gait(gait_number) -> GaitParams:
    """Look up the fixed-gait parameters for a (traced) gait number."""
    g = jnp.clip(jnp.asarray(gait_number, jnp.int32), 0, 11)
    return GaitParams(
        offsets=jnp.asarray(_OFFS)[g],
        durations=jnp.asarray(_DURS)[g],
        h=jnp.asarray(_HS)[g],
    )


def phase_of(iteration_counter, iterations_per_mpc, params: GaitParams):
    """(segment_index, continuous phase in [0,1)) — Gait.cpp:187-193."""
    period = iterations_per_mpc * params.h
    segment = (iteration_counter // iterations_per_mpc) % params.h
    phase = (iteration_counter % period).astype(jnp.float32) / period.astype(
        jnp.float32
    )
    return segment, phase


def contact_state(phase, params: GaitParams):
    """Per-leg stance progress in [0,1], 0 if swinging (Gait.cpp:61-79)."""
    hf = params.h.astype(jnp.float32)
    offs = params.offsets.astype(jnp.float32) / hf
    durs = params.durations.astype(jnp.float32) / hf
    progress = phase - offs
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    return jnp.where(progress > durs, 0.0, progress / jnp.maximum(durs, 1e-10))


def swing_state(phase, params: GaitParams):
    """Per-leg swing progress in [0,1], 0 if in stance (Gait.cpp:97-123)."""
    hf = params.h.astype(jnp.float32)
    offs = params.offsets.astype(jnp.float32) / hf
    durs = params.durations.astype(jnp.float32) / hf
    swing_offset = offs + durs
    swing_offset = jnp.where(swing_offset > 1.0, swing_offset - 1.0, swing_offset)
    swing_duration = 1.0 - durs
    progress = phase - swing_offset
    progress = jnp.where(progress < 0, progress + 1.0, progress)
    return jnp.where(
        progress > swing_duration,
        0.0,
        jnp.where(swing_duration < 1e-10, 0.0, progress / jnp.maximum(swing_duration, 1e-10)),
    )


def mpc_table(segment, params: GaitParams, h_max: int):
    """(h_max, 4) binary contact table rolled from the current segment
    (Gait.cpp:142-166); rows >= h are zero."""
    i = jnp.arange(h_max, dtype=jnp.int32)[:, None]          # (h_max, 1)
    it = (i + segment + 1) % params.h
    progress = it - params.offsets[None, :]
    progress = jnp.where(progress < 0, progress + params.h, progress)
    table = (progress < params.durations[None, :]).astype(jnp.float32)
    return jnp.where(i < params.h, table, 0.0)


def swing_time(dt_mpc, params: GaitParams):
    """Per-leg swing duration in seconds (Gait.cpp:215-219)."""
    return dt_mpc * (params.h - params.durations).astype(jnp.float32)


def stance_time(dt_mpc, params: GaitParams):
    """Per-leg stance duration in seconds (Gait.cpp:225-229)."""
    return dt_mpc * params.durations.astype(jnp.float32)


def aio_params(v_body, yaw_rate, prev: GaitParams, phase, h_max: int):
    """Adaptive "aio" gait reshaping (ConvexMPCLocomotion.cpp:173-236).

    Only updates when the gait phase wraps to 0 (which occurs on MPC-tick
    boundaries). Returns (params, gait_number, counter_reset) where
    counter_reset requests iterationCounter = 0 when the horizon changed.
    Note the reference's vBody is sqrt(vx^2) + vy^2 (a literal transcription
    of its expression at ConvexMPCLocomotion.cpp:175).
    """
    at_boundary = phase == 0.0

    def shaped(h, offs, durs, gait_number):
        h = jnp.minimum(jnp.asarray(h, jnp.int32), h_max)
        return (
            GaitParams(
                offsets=jnp.asarray(offs, jnp.int32) % jnp.maximum(h, 1),
                durations=jnp.minimum(jnp.asarray(durs, jnp.int32), h),
                h=h,
            ),
            jnp.asarray(gait_number, jnp.int32),
        )

    # candidate shapes, selected by speed bands
    standing = shaped(10, jnp.zeros(4), jnp.full(4, 10), 4)
    trot_slow = shaped(10, jnp.array([0, 5, 5, 0]), jnp.full(4, 5), 9)
    h16 = 16
    walking = shaped(
        h16,
        jnp.array([0, h16 // 2, h16 // 4, 3 * h16 // 4]),
        jnp.full(4, 3 * h16 // 4),
        9,
    )
    # walking->trot morph for 0.2 < v <= 0.4: offsets slide with speed
    hw = jnp.asarray(h16, jnp.float32)
    o2 = jnp.floor(hw * (5.0 / 4.0) * v_body).astype(jnp.int32)
    o3 = jnp.floor(hw * ((5.0 / 4.0) * v_body + 0.5)).astype(jnp.int32)
    dwt = jnp.floor(hw * ((-5.0 / 4.0) * v_body + 1.0)).astype(jnp.int32)
    walk2trot = shaped(
        h16, jnp.stack([jnp.zeros((), jnp.int32), jnp.asarray(h16 // 2, jnp.int32), o2, o3]),
        jnp.full(4, 1, jnp.int32) * dwt, 9
    )
    trot_mid = shaped(14, jnp.array([0, 7, 7, 0]), jnp.full(4, 7), 9)
    hf = jnp.clip(jnp.floor(-20.0 * v_body + 42.0).astype(jnp.int32), 10, h_max)
    trot_fast = (
        GaitParams(
            offsets=jnp.stack(
                [jnp.zeros((), jnp.int32), hf // 2, hf // 2, jnp.zeros((), jnp.int32)]
            ),
            durations=jnp.full((4,), 1, jnp.int32) * (hf // 2),
            h=hf,
        ),
        jnp.asarray(9, jnp.int32),
    )

    is_still = v_body < 0.002
    idx = jnp.where(
        is_still & (jnp.abs(yaw_rate) < 0.01),
        0,
        jnp.where(
            is_still,
            1,
            jnp.where(
                v_body <= 0.2,
                2,
                jnp.where(v_body <= 0.4, 3, jnp.where(v_body <= 1.4, 4, 5)),
            ),
        ),
    )
    cands = [standing, trot_slow, walking, walk2trot, trot_mid, trot_fast]
    offsets = jnp.stack([c[0].offsets for c in cands])[idx]
    durations = jnp.stack([c[0].durations for c in cands])[idx]
    h = jnp.stack([c[0].h for c in cands])[idx]
    gait_number = jnp.stack([c[1] for c in cands])[idx]

    new = GaitParams(
        offsets=jnp.where(at_boundary, offsets, prev.offsets),
        durations=jnp.where(at_boundary, durations, prev.durations),
        h=jnp.where(at_boundary, h, prev.h),
    )
    counter_reset = at_boundary & (new.h != prev.h)
    gait_number = jnp.where(at_boundary, gait_number, jnp.asarray(9, jnp.int32))
    return new, gait_number, counter_reset


# ---------------------------------------------------------------------------
# MixedFrequencyGait: per-leg independent periods + duty cycle. The reference
# defines it (Gait.cpp:43-51, 81-95, 125-139, 168-184, 195-205) but
# instantiates it nowhere (instances commented out,
# ConvexMPCLocomotion.h:148); provided for capability parity.

def mixed_phase_of(iteration_counter, iterations_per_mpc, periods):
    """Per-leg phase in [0,1). periods: (4,) int32 segments per leg."""
    denom = iterations_per_mpc * periods
    return (iteration_counter % denom).astype(jnp.float32) / denom.astype(
        jnp.float32
    )


def mixed_contact_state(phase, duty_cycle):
    progress = jnp.where(phase < 0, phase + 1.0, phase)
    return jnp.where(progress > duty_cycle, 0.0, progress / duty_cycle)


def mixed_swing_state(phase, duty_cycle):
    progress = phase - duty_cycle
    return jnp.where(progress < 0, 0.0, progress / (1.0 - duty_cycle))


def mixed_mpc_table(iteration_counter, iterations_per_mpc, periods,
                    duty_cycle, h_max: int):
    """(h_max, 4) contact table (Gait.cpp:168-184)."""
    seg = iteration_counter // iterations_per_mpc
    i = jnp.arange(h_max, dtype=jnp.int32)[:, None]
    progress = (i + seg + 1) % periods[None, :]
    return (progress.astype(jnp.float32)
            < periods[None, :].astype(jnp.float32) * duty_cycle).astype(
        jnp.float32
    )


def mixed_swing_time(dt_mpc, periods, duty_cycle):
    return dt_mpc * (1.0 - duty_cycle) * periods.astype(jnp.float32)


def mixed_stance_time(dt_mpc, periods, duty_cycle):
    return dt_mpc * duty_cycle * periods.astype(jnp.float32)
