"""ctypes bridge to the UNMODIFIED reference controller built as a golden
shared library by tests/build_reference.sh (reference src/GaitCtrller.h:63-99
extern "C" surface, driven exactly as scripts/walking_simulation.py drives it).

Nothing here reimplements reference behavior — it only marshals arrays the
way the reference's Python node does (walking_simulation.py:358-381, 521-573):
imu[10] = [accel(3), quat xyzw(4), gyro(3)], leg[24] = [q(12), qd(12)].
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

BUILD_SCRIPT = Path(__file__).with_name("build_reference.sh")
DEFAULT_OUT = Path(os.environ.get("QUADRUPED_REF_OUT", "/tmp/quadruped_ref"))
LIB = DEFAULT_OUT / "libquadruped_ctrl_ref.so"


class JointEff(ctypes.Structure):
    _fields_ = [("eff", ctypes.c_double * 12)]


def ensure_built(timeout: float = 900.0) -> Path | None:
    """Build (or reuse) the golden library; None if the build fails."""
    if LIB.exists():
        return LIB
    try:
        subprocess.run(
            ["bash", str(BUILD_SCRIPT), str(DEFAULT_OUT)],
            check=True,
            timeout=timeout,
            capture_output=True,
        )
    except (subprocess.SubprocessError, OSError):
        return None
    return LIB if LIB.exists() else None


def _darr(values) -> ctypes.Array:
    a = np.asarray(values, dtype=np.float64).ravel()
    return (ctypes.c_double * a.size)(*a)


def _fresh_lib() -> ctypes.CDLL:
    """dlopen a FRESH copy of the golden library.

    The reference keeps controller state in C++ globals/statics (GaitCtrller
    constructed by init_controller plus function-level statics); dlopen
    dedups by inode, so `ctypes.CDLL(LIB)` would hand every instance the
    SAME statics — a second trace in one process inherits the first one's
    residue (measured: mode-1 window-3 torque median 0.488 N*m fresh vs
    0.737 N*m after a prior trot trace). Copying the .so to a unique path
    gives each instance its own statics, making golden lanes hermetic and
    order-independent."""
    import shutil
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".so", prefix="quadruped_ref_")
    os.close(fd)
    shutil.copyfile(str(LIB), path)
    lib = ctypes.CDLL(path)
    try:
        os.unlink(path)      # the mapping keeps the file alive (POSIX)
    except OSError:
        pass
    return lib


class ReferenceController:
    """The reference stack behind its own C ABI (GaitCtrller.h:63-99)."""

    def __init__(self, freq: float = 500.0,
                 pid=(100.0, 1.0, 0.0, 0.05)):
        self.lib = _fresh_lib()
        self.lib.torque_calculator.restype = ctypes.POINTER(JointEff)
        self.lib.init_controller(ctypes.c_double(freq), _darr(pid))

    def pre_work(self, imu, leg) -> None:
        self.lib.pre_work(_darr(imu), _darr(leg))

    def set_gait_type(self, gait: int) -> None:
        self.lib.set_gait_type(ctypes.c_int(int(gait)))

    def set_robot_mode(self, mode: int) -> None:
        self.lib.set_robot_mode(ctypes.c_int(int(mode)))

    def set_robot_vel(self, vel) -> None:
        self.lib.set_robot_vel(_darr(vel))

    def torques(self, imu, leg) -> np.ndarray:
        out = self.lib.torque_calculator(_darr(imu), _darr(leg))
        return np.array(out.contents.eff, dtype=np.float64)


class ReferenceMPC:
    """Direct access to the reference's dense condensed MPC
    (convexMPC_interface.h: setup_problem / update_problem_data_floats /
    get_solution), bypassing the controller — for QP-level differential
    testing on identical inputs (the JCQP main.cpp cross-solver pattern)."""

    def __init__(self):
        self.lib = _fresh_lib()
        self.lib.setup_problem.argtypes = [
            ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
        self.lib.get_solution.restype = ctypes.c_double
        self.lib.get_solution.argtypes = [ctypes.c_int]
        fp = ctypes.POINTER(ctypes.c_float)
        self.lib.update_problem_data_floats.argtypes = [
            fp, fp, fp, fp, fp, ctypes.c_float, fp, fp, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        # update_x_drag(float) is C++-mangled (convexMPC_interface.h:47)
        self._x_drag = getattr(self.lib, "_Z13update_x_dragf")
        self._x_drag.argtypes = [ctypes.c_float]

    def solve(self, *, dt_mpc, h, mu, f_max, p, v, quat_wxyz, omega, r_feet,
              yaw, weights, traj, alpha, gait_table, x_drag=0.0) -> np.ndarray:
        """Solve one dense condensed MPC exactly as solveDenseMPC does
        (ConvexMPCLocomotion.cpp:592-687). Returns (h, 4, 3) world GRFs."""
        self.lib.setup_problem(
            ctypes.c_double(dt_mpc), ctypes.c_int(int(h)),
            ctypes.c_double(mu), ctypes.c_double(f_max),
        )
        self._x_drag(ctypes.c_float(x_drag))

        def farr(vals):
            a = np.asarray(vals, dtype=np.float32).ravel()
            return (ctypes.c_float * a.size)(*a)

        traj = np.asarray(traj, np.float32)
        if traj.shape[-1] == 13:           # our padded 13-state layout
            traj = traj[..., :12]
        gait = np.asarray(gait_table, np.float64).ravel()
        gait_c = (ctypes.c_int * gait.size)(*[int(round(g)) for g in gait])
        self.lib.update_problem_data_floats(
            farr(p), farr(v), farr(quat_wxyz), farr(omega), farr(r_feet),
            ctypes.c_float(yaw), farr(weights), farr(traj),
            ctypes.c_float(alpha), gait_c,
        )
        out = np.array(
            [self.lib.get_solution(i) for i in range(12 * int(h))], np.float64
        )
        return out.reshape(int(h), 4, 3)


def sensors_to_arrays(sens) -> tuple[np.ndarray, np.ndarray]:
    """Our Sensors pytree -> (imu[10], leg[24]) in the reference layout."""
    imu = np.concatenate(
        [
            np.asarray(sens.accelerometer, np.float64),
            np.asarray(sens.quat, np.float64),  # already xyzw (PyBullet order)
            np.asarray(sens.gyro, np.float64),
        ]
    )
    leg = np.concatenate(
        [np.asarray(sens.q, np.float64), np.asarray(sens.qd, np.float64)]
    )
    return imu, leg
