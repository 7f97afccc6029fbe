// Golden-test shim exposing the UNMODIFIED reference rigid-body dynamics
// (/root/reference/src/Dynamics/FloatingBaseModel.{h,cpp}, built by
// Quadruped::buildModel with EXPLICIT GEARED ROTOR BODIES,
// Quadruped.cpp:117-206) through a C ABI, so the repo's FloatingBaseModel
// re-derivation (quadruped_ctrl_tpu/models/floating_base.py) — which folds
// rotors into reflected inertia on the joint diagonal — can be
// differential-tested against the reference's rotor-exact CRBA/ABA.
//
// This file contains no reference code: it only constructs the reference's
// own model and marshals Eigen <-> flat double arrays. Compiled by
// tests/build_reference.sh into libdyn_shim_ref.so (gitignored /tmp output).

#include "Dynamics/FloatingBaseModel.h"
#include "Dynamics/MiniCheetah.h"
#include "Dynamics/Quadruped.h"

static Quadruped<double>* gQuad = nullptr;
static FloatingBaseModel<double>* gModel = nullptr;

extern "C" {

void dyn_init() {
  if (!gModel) {
    gQuad = new Quadruped<double>(buildMiniCheetah<double>());
    gModel = new FloatingBaseModel<double>(gQuad->buildModel());
  }
}

// state layout: quat wxyz(4), position(3), body spatial velocity
// [omega;v](6, body coords), q(12), qd(12) — FBModelState fields in order
void dyn_set_state(const double* s) {
  FBModelState<double> st;
  st.bodyOrientation << s[0], s[1], s[2], s[3];
  st.bodyPosition << s[4], s[5], s[6];
  for (int i = 0; i < 6; ++i) st.bodyVelocity[i] = s[7 + i];
  st.q = DVec<double>(12);
  st.qd = DVec<double>(12);
  for (int i = 0; i < 12; ++i) {
    st.q[i] = s[13 + i];
    st.qd[i] = s[25 + i];
  }
  gModel->setState(st);
}

// generalized mass matrix (18x18 row-major), rotor terms exact
void dyn_mass_matrix(double* out) {
  DMat<double> h = gModel->massMatrix();
  for (int r = 0; r < 18; ++r)
    for (int c = 0; c < 18; ++c) out[r * 18 + c] = h(r, c);
}

void dyn_gravity_force(double* out) {
  DVec<double> g = gModel->generalizedGravityForce();
  for (int i = 0; i < 18; ++i) out[i] = g(i);
}

void dyn_coriolis_force(double* out) {
  DVec<double> c = gModel->generalizedCoriolisForce();
  for (int i = 0; i < 18; ++i) out[i] = c(i);
}

// articulated-body forward dynamics with rotor-exact handling:
// tau(12) -> [dBodyVelocity(6), qdd(12)]
void dyn_aba(const double* tau, double* out) {
  DVec<double> t(12);
  for (int i = 0; i < 12; ++i) t(i) = tau[i];
  FBModelStateDerivative<double> ds;
  gModel->runABA(t, ds);
  for (int i = 0; i < 6; ++i) out[i] = ds.dBodyVelocity[i];
  for (int i = 0; i < 12; ++i) out[6 + i] = ds.qdd(i);
}

// world-frame ground-contact-point positions. The build registers 8 body-box
// corners first (addGroundContactBoxPoints), then per leg a knee point and a
// foot point (Quadruped.cpp:85-105): n = 8 + 8 = 16.
int dyn_num_gc() { return (int)gModel->_nGroundContact; }

void dyn_gc_positions(double* out /* n x 3 row-major */) {
  gModel->forwardKinematics();
  for (size_t i = 0; i < gModel->_nGroundContact; ++i) {
    for (int k = 0; k < 3; ++k) out[i * 3 + k] = gModel->_pGC[i][k];
  }
}

}  // extern "C"
