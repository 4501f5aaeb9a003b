// Golden-parity oracle for the force-balance stance QP.
//
// Compiles the REFERENCE's own builder functions
// (quadruped/src/controllers/balance_controller/qr_qp_torque_optimizer.cpp:
// ComputeMassMatrix :401 world-frame overload, ComputeObjectiveMatrix :154,
// ComputeConstraintMatrix :113 world-frame overload) plus vendored
// QuadProg++, and replicates the world-frame ComputeContactForce flow
// (:303-399) with explicit inputs instead of a qrRobot pointer
// (the only robot-derived quantities it uses are mass, inertia, quat and
// foot positions; ComputeWeightMatrix :183 is a constant 1e-4 I).
//
// stdin-file format: one float per line —
//   mass(1) inertia(9 row-major) quat(4 wxyz) feet_base(12 = 4 legs x 3)
//   desiredAcc(6) accWeight(6) contacts(4 as 0/1) fMinRatio(4)
//   fMaxRatio(4) frictionCoef(1) normal(3) tangent1(3) tangent2(3)
// Output: 12 floats — the 3x4 matrix ComputeContactForce returns
// (column l = base-frame force of leg l), column-major by leg.

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "controllers/balance_controller/qr_qp_torque_optimizer.h"
#include "estimators/qr_ground_surface_estimator.h"
#include "utils/qr_se3.h"
#include "QuadProg++.hh"
#include "Array.hh"

using namespace Quadruped;

// Link stub: the control-frame ComputeContactForce overload in the
// reference .cpp references this ground-estimator member; the oracle
// only exercises the world-frame path, so it is never called.
Eigen::Matrix<float, 3, 3> qrGroundSurfaceEstimator::GetAlignedDirections() {
  std::abort();
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: fb_golden case.txt\n");
    return 2;
  }
  FILE* f = std::fopen(argv[1], "r");
  if (!f) return 2;
  std::vector<float> v;
  double x;
  while (std::fscanf(f, "%lf", &x) == 1) v.push_back((float)x);
  std::fclose(f);
  if (v.size() != 60) {
    std::fprintf(stderr, "expected 60 values, got %zu\n", v.size());
    return 2;
  }
  int i = 0;
  float mass = v[i++];
  Mat3<float> inertia;
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) inertia(r, c) = v[i++];
  Quat<float> quat;
  for (int k = 0; k < 4; ++k) quat[k] = v[i++];
  Eigen::Matrix<float, 3, 4> feetBase;
  for (int l = 0; l < 4; ++l)
    for (int k = 0; k < 3; ++k) feetBase(k, l) = v[i++];
  Eigen::Matrix<float, 6, 1> desiredAcc;
  for (int k = 0; k < 6; ++k) desiredAcc(k) = v[i++];
  Eigen::Matrix<float, 6, 1> accWeight;
  for (int k = 0; k < 6; ++k) accWeight(k) = v[i++];
  Eigen::Matrix<bool, 4, 1> contacts;
  for (int k = 0; k < 4; ++k) contacts(k) = v[i++] > 0.5f;
  Vec4<float> fMinRatio, fMaxRatio;
  for (int k = 0; k < 4; ++k) fMinRatio(k) = v[i++];
  for (int k = 0; k < 4; ++k) fMaxRatio(k) = v[i++];
  float frictionCoef = v[i++];
  Vec3<float> normal, tangent1, tangent2;
  for (int k = 0; k < 3; ++k) normal(k) = v[i++];
  for (int k = 0; k < 3; ++k) tangent1(k) = v[i++];
  for (int k = 0; k < 3; ++k) tangent2(k) = v[i++];

  // --- ComputeContactForce (:303) with the robot fields inlined ---
  Mat3<float> rotMat =
      robotics::math::quaternionToRotationMatrix(quat).transpose();
  Eigen::Matrix<float, 3, 4> footPositionsInCOMWorldFrame =
      robotics::math::invertRigidTransform<float, 4>({0.f, 0.f, 0.f}, quat,
                                                     feetBase);
  Eigen::Matrix<float, 6, 12> massMatrix = ComputeMassMatrix(
      mass, inertia, footPositionsInCOMWorldFrame.transpose(), rotMat);

  Eigen::Matrix<float, 6, 1> g = Eigen::Matrix<float, 6, 1>::Zero();
  g(2, 0) = 9.8f;
  float regWeight = 1e-4f;
  auto Ga = ComputeObjectiveMatrix(massMatrix, desiredAcc, accWeight,
                                   regWeight, g);
  Eigen::Matrix<float, 12, 12> G = std::get<0>(Ga);
  G += 1e-4f * Eigen::Matrix<float, 12, 12>::Identity();  // ComputeWeightMatrix
  Eigen::Matrix<float, 12, 1> a = std::get<1>(Ga);

  auto CI = ComputeConstraintMatrix(mass, contacts, frictionCoef, fMinRatio,
                                    fMaxRatio, normal, tangent1, tangent2);
  Eigen::Matrix<float, 12, 24> Ci = std::get<0>(CI);
  Eigen::Matrix<float, 24, 1> b = std::get<1>(CI);

  quadprogpp::Matrix<double> GG(12, 12);
  for (int r = 0; r < 12; ++r)
    for (int c = 0; c < 12; ++c) GG[r][c] = double(G(c, r));
  quadprogpp::Vector<double> aa(12);
  for (int r = 0; r < 12; ++r) aa[r] = double(-a(r, 0));
  quadprogpp::Matrix<double> CICI(12, 24);
  for (int r = 0; r < 12; ++r)
    for (int c = 0; c < 24; ++c) CICI[r][c] = double(Ci(r, c));
  quadprogpp::Vector<double> bb(24);
  for (int r = 0; r < 24; ++r) bb[r] = double(-b(r, 0));
  quadprogpp::Matrix<double> CECE(12, 0);
  quadprogpp::Vector<double> ee(0);
  quadprogpp::Vector<double> sol(12);
  quadprogpp::solve_quadprog(GG, aa, CECE, ee, CICI, bb, sol);

  Eigen::Matrix<float, 4, 3> X;
  for (int l = 0; l < 4; ++l)
    for (int k = 0; k < 3; ++k) X(l, k) = -float(sol[3 * l + k]);
  Eigen::Matrix<float, 3, 4> out =
      robotics::math::RigidTransform<float, 4>({0.f, 0.f, 0.f}, quat,
                                               X.transpose());
  for (int l = 0; l < 4; ++l)
    for (int k = 0; k < 3; ++k) std::printf("%.9g\n", out(k, l));
  return 0;
}
