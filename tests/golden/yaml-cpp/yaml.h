// Header-only YAML::Node stub for the golden-parity oracle build.
// The reference headers (robots/qr_robot.h:33) include yaml-cpp, but the
// oracle calls only the free QP-builder functions, which never touch
// YAML; no yaml-cpp symbol is ever linked. Mirrors the tests/golden/ros
// shim approach.
#pragma once
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace YAML {

class Node {
 public:
  Node() = default;
  template <typename T>
  T as() const { throw std::runtime_error("yaml stub"); }
  Node operator[](const std::string&) const { return Node(); }
  Node operator[](const char*) const { return Node(); }
  Node operator[](int) const { return Node(); }
  bool IsDefined() const { return false; }
  explicit operator bool() const { return false; }
  std::size_t size() const { return 0; }
};

inline Node LoadFile(const std::string&) { return Node(); }

}  // namespace YAML
