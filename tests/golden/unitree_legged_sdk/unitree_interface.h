// Stub of the Unitree SDK interface for the golden-parity oracle build
// (the real header needs the vendor .so; the oracle never does robot I/O).
// Provides just the types qr_robot.h references (LowState member at :637).
#pragma once
#include <array>

struct IMUStub {
  std::array<float, 4> quaternion = {1, 0, 0, 0};
  std::array<float, 3> gyroscope = {0, 0, 0};
  std::array<float, 3> accelerometer = {0, 0, 0};
  std::array<float, 3> rpy = {0, 0, 0};
};

struct MotorStateStub {
  float q = 0, dq = 0, ddq = 0, tauEst = 0;
};

struct LowState {
  IMUStub imu;
  std::array<MotorStateStub, 20> motorState;
  std::array<int16_t, 4> footForce = {0, 0, 0, 0};
};
