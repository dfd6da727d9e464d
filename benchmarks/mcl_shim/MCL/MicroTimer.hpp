// Minimal mcl::MicroTimer shim (the mclscene submodule is not checked out
// in the reference snapshot; this provides the consumed API surface so the
// reference library can be built as the CPU baseline oracle).
#ifndef MCL_MICROTIMER_SHIM_H
#define MCL_MICROTIMER_SHIM_H
#include <chrono>

namespace mcl {

class MicroTimer {
  using clock = std::chrono::steady_clock;
  clock::time_point t0;

 public:
  MicroTimer() : t0(clock::now()) {}
  void reset() { t0 = clock::now(); }
  double elapsed_ms() const {
    return std::chrono::duration<double, std::milli>(clock::now() - t0).count();
  }
  double elapsed_s() const {
    return std::chrono::duration<double>(clock::now() - t0).count();
  }
  double elapsed_us() const {
    return std::chrono::duration<double, std::micro>(clock::now() - t0).count();
  }
};

}  // namespace mcl
#endif
