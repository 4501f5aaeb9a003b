// Minimal ros::Time stub so reference headers (qr_timer.h, qr_tools.h)
// compile outside a catkin workspace for the golden-parity harness.
// Only the symbols those headers reference are provided.
#pragma once
#include <chrono>

namespace ros {

struct Time {
  double t = 0.0;
  double toSec() const { return t; }
  static Time now() {
    using clock = std::chrono::steady_clock;
    return Time{std::chrono::duration<double>(
        clock::now().time_since_epoch()).count()};
  }
};

inline void init(int, char**, const char*) {}

}  // namespace ros
