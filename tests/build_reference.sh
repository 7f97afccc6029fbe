#!/usr/bin/env bash
# Build the UNMODIFIED reference controller (/root/reference, read-only) into
# a golden shared library for differential testing against this framework.
#
# Mirrors the reference build (CMakeLists.txt:60-91) without catkin/ROS: the
# library target has no actual ROS dependency — catkin only supplies message
# generation for the Python node. Outputs (default /tmp/quadruped_ref):
#   libqpOASES_ref.so, libJCQP_ref.so, libosqp_ref.so, libquadruped_ctrl_ref.so
#
# Nothing from /root/reference is copied into this repo; objects and the
# shims live under the (gitignored, tmpfs) output directory.
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${1:-/tmp/quadruped_ref}
mkdir -p "$OUT/obj" "$OUT/shim"

if [[ -f "$OUT/libquadruped_ctrl_ref.so" && -f "$OUT/libdyn_shim_ref.so" \
      && -z "${FORCE:-}" ]]; then
  echo "already built: $OUT/libquadruped_ctrl_ref.so (FORCE=1 to rebuild)"
  exit 0
fi

# Eigen: the image has no system Eigen; TensorFlow vendors a full copy
# (Eigen 3.4 line, includes unsupported/Eigen/MatrixFunctions needed by
# SolverMPC.cpp's matrix exponential).
EIGEN=$(python - <<'EOF'
import glob, sys
cands = glob.glob("/opt/venv/lib/python*/site-packages/tensorflow/include")
print(cands[0] if cands else sys.exit("no eigen found"))
EOF
)

# JCQP/controller include Eigen as <eigen3/Eigen/...>: provide that prefix
ln -sfn "$EIGEN" "$OUT/shim/eigen3"

CXX=${CXX:-g++}
CC=${CC:-gcc}
CXXFLAGS="-O2 -fPIC -std=c++17 -mavx2 -mfma -w"
CFLAGS="-O2 -fPIC -w"
NPROC=$(nproc)

compile() { # compile <obj-prefix> <compiler> <flags...> -- <sources...>
  local prefix=$1 comp=$2; shift 2
  local flags=() srcs=()
  local in_srcs=0
  for a in "$@"; do
    if [[ $a == -- ]]; then in_srcs=1; continue; fi
    if [[ $in_srcs == 1 ]]; then srcs+=("$a"); else flags+=("$a"); fi
  done
  local pids=() objs=()
  for s in "${srcs[@]}"; do
    local o="$OUT/obj/${prefix}_$(basename "$s" | tr . _).o"
    objs+=("$o")
    if [[ ! -f $o || $s -nt $o ]]; then
      "$comp" "${flags[@]}" -c "$s" -o "$o" &
      pids+=($!)
      if (( ${#pids[@]} >= NPROC )); then wait "${pids[0]}"; pids=("${pids[@]:1}"); fi
    fi
  done
  for p in "${pids[@]:-}"; do [[ -n $p ]] && wait "$p"; done
  echo "${objs[@]}"
}

echo "== qpOASES (active-set solver, reference primary dense path)"
# the vendored tree uses <qpOASES/include/qpOASES/...> includes, rooted at src/
QPO_OBJS=$(compile qpo "$CXX" $CXXFLAGS -I"$REF/src" \
  -I"$REF/src/qpOASES/include" -- "$REF"/src/qpOASES/src/*.cpp)
$CXX -shared -o "$OUT/libqpOASES_ref.so" $QPO_OBJS

echo "== JCQP (custom ADMM + AVX2 LDLT)"
JCQP_CPP_OBJS=$(compile jcqp "$CXX" $CXXFLAGS -I"$REF/src/JCQP" \
  -I"$REF/src/JCQP/amd/include" -I"$EIGEN" -I"$OUT/shim" -- \
  "$REF"/src/JCQP/QpProblem.cpp "$REF"/src/JCQP/ProblemGenerator.cpp \
  "$REF"/src/JCQP/eigenvalues.cpp "$REF"/src/JCQP/CholeskyDenseSolver.cpp \
  "$REF"/src/JCQP/CholeskySparseSolver.cpp "$REF"/src/JCQP/SparseMatrixMath.cpp)
JCQP_C_OBJS=$(compile jcqpamd "$CC" $CFLAGS -I"$REF/src/JCQP/amd/include" -- \
  "$REF"/src/JCQP/amd/src/*.c)
$CXX -shared -o "$OUT/libJCQP_ref.so" $JCQP_CPP_OBJS $JCQP_C_OBJS -lpthread

echo "== OSQP (ADMM + QDLDL, sparse-MPC path)"
# the checked-in osqp_configure.h enables the MKL Pardiso *loader* (a
# dlopen shim; MKL itself is only needed if selected at runtime, which the
# reference never does — qdldl is the default linsys)
QDLDL_DIR="$REF/src/osqp/lin_sys/direct/qdldl"
PARDISO_DIR="$REF/src/osqp/lin_sys/direct/pardiso"
OSQP_INC=(-I"$REF/src/osqp/include" -I"$QDLDL_DIR" -I"$PARDISO_DIR" \
  -I"$REF/src/osqp/lin_sys" \
  -I"$QDLDL_DIR/qdldl_sources/include" -I"$QDLDL_DIR/amd/include")
OSQP_OBJS=$(compile osqp "$CC" $CFLAGS "${OSQP_INC[@]}" -- \
  "$REF"/src/osqp/src/*.c "$QDLDL_DIR/qdldl_interface.c" \
  "$QDLDL_DIR/qdldl_sources/src/qdldl.c" "$QDLDL_DIR"/amd/src/*.c \
  "$PARDISO_DIR"/pardiso_interface.c "$PARDISO_DIR"/pardiso_loader.c \
  "$REF"/src/osqp/lin_sys/lib_handler.c)
$CC -shared -o "$OUT/libosqp_ref.so" $OSQP_OBJS -lm -ldl

echo "== controller library (CMakeLists.txt:65-83 source list)"
CTRL_SRcs=(
  MPC_Ctrl/ConvexMPCLocomotion.cpp MPC_Ctrl/Gait.cpp MPC_Ctrl/SparseCMPC.cpp
  MPC_Ctrl/SparseCMPC_Math.cpp MPC_Ctrl/OsqpTriples.cpp
  MPC_Ctrl/convexMPC_interface.cpp MPC_Ctrl/SolverMPC.cpp
  MPC_Ctrl/RobotState.cpp Controllers/FootSwingTrajectory.cpp
  Controllers/LegController.cpp Controllers/DesiredStateCommand.cpp
  Controllers/OrientationEstimator.cpp Controllers/PositionVelocityEstimator.cpp
  Controllers/SafetyChecker.cpp Dynamics/Quadruped.cpp
  Dynamics/FloatingBaseModel.cpp GaitCtrller.cpp
)
CTRL_PATHS=()
for s in "${CTRL_SRcs[@]}"; do CTRL_PATHS+=("$REF/src/$s"); done
CTRL_OBJS=$(compile ctrl "$CXX" $CXXFLAGS -I"$REF/src" -I"$EIGEN" -I"$OUT/shim" \
  -I"$REF/src/qpOASES/include" -I"$REF/src/JCQP" "${OSQP_INC[@]}" -- \
  "${CTRL_PATHS[@]}")
$CXX -shared -o "$OUT/libquadruped_ctrl_ref.so" $CTRL_OBJS \
  -L"$OUT" -lqpOASES_ref -lJCQP_ref -losqp_ref -Wl,-rpath,"$OUT" -lpthread

echo "== dynamics shim (rotor-exact FloatingBaseModel golden surface)"
SHIM_SRC="$(dirname "${BASH_SOURCE[0]}")/dyn_shim.cpp"
SHIM_OBJS=$(compile dynshim "$CXX" $CXXFLAGS -I"$REF/src" -I"$EIGEN" \
  -I"$OUT/shim" -- "$SHIM_SRC")
$CXX -shared -o "$OUT/libdyn_shim_ref.so" $SHIM_OBJS \
  -L"$OUT" -lquadruped_ctrl_ref -Wl,-rpath,"$OUT"

echo "built: $OUT/libquadruped_ctrl_ref.so"
