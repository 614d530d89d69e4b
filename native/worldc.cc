// worldc: native world-compilation helpers.
//
// TPU-native counterpart of the geometry-ingestion half of libstage /
// stageros (bitmap -> occupancy matrix -> raytraceable geometry; cf.
// stage_ros-add_pose_and_crash/src/stageros.cpp:337-352 world loading).
// The hot simulation path runs entirely on-device (XLA); this host-side
// library extracts the occupied/free boundary of an occupancy grid as unit
// edges, which Python merges into maximal line segments for the lidar
// kernel.  Exposed via a C ABI and consumed with ctypes
// (rl_collision_avoidance_tpu/utils/native.py).

#include <cstdint>

extern "C" {

// grid: gy x gx row-major occupancy (non-zero = occupied).
// out: capacity `cap` int64s, filled with (level, start, axis) triples:
//   axis 0: horizontal edge y=level, x in [start, start+1]
//   axis 1: vertical   edge x=level, y in [start, start+1]
// Returns the number of edges written, or -1 if capacity is exceeded.
long long worldc_boundary_edges(const uint8_t* grid, long long gy,
                                long long gx, long long* out,
                                long long cap) {
  long long n = 0;
  auto at = [&](long long y, long long x) -> bool {
    if (y < 0 || y >= gy || x < 0 || x >= gx) return false;
    return grid[y * gx + x] != 0;
  };
  // Horizontal edges between rows y-1 and y (y in [0, gy]).
  for (long long y = 0; y <= gy; ++y) {
    for (long long x = 0; x < gx; ++x) {
      if (at(y, x) != at(y - 1, x)) {
        if (n * 3 + 3 > cap) return -1;
        out[n * 3 + 0] = y;
        out[n * 3 + 1] = x;
        out[n * 3 + 2] = 0;
        ++n;
      }
    }
  }
  // Vertical edges between columns x-1 and x (x in [0, gx]).
  for (long long y = 0; y < gy; ++y) {
    for (long long x = 0; x <= gx; ++x) {
      if (at(y, x) != at(y, x - 1)) {
        if (n * 3 + 3 > cap) return -1;
        out[n * 3 + 0] = x;
        out[n * 3 + 1] = y;
        out[n * 3 + 2] = 1;
        ++n;
      }
    }
  }
  return n;
}

}  // extern "C"
