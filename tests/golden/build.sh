#!/bin/bash
# Build the golden-parity oracle against the reference sources IN PLACE
# (read-only at /root/reference; nothing is copied into this repo).
set -e
REF=${REF:-/root/reference/quadruped}
OUT=${OUT:-/tmp/golden_build}
HERE="$(cd "$(dirname "$0")" && pwd)"
EIGEN=$(python - <<'EOF'
import pathlib, sys
for cand in ("/opt/venv/lib/python3.12/site-packages/tensorflow/include",
             "/usr/include/eigen3"):
    if pathlib.Path(cand, "Eigen").exists():
        print(cand); sys.exit(0)
sys.exit(1)
EOF
)
mkdir -p "$OUT"
# <eigen3/Eigen/...> shim expected by qr_algebra.h
[ -e "$OUT/eigen3" ] || ln -s "$EIGEN" "$OUT/eigen3"

if [ ! -f "$OUT/libqpoases.a" ]; then
  echo "building qpOASES..."
  mkdir -p "$OUT/qpoases_obj"
  for f in "$REF"/extern/qpOASES/src/*.cpp; do
    g++ -O2 -c -fPIC -I"$REF/extern/qpOASES/include" \
        -o "$OUT/qpoases_obj/$(basename "$f" .cpp).o" "$f" 2>/dev/null
  done
  ar rcs "$OUT/libqpoases.a" "$OUT"/qpoases_obj/*.o
fi

echo "building oracle..."
g++ -O2 -std=c++14 -o "$OUT/mpc_golden" \
  "$HERE/mpc_golden_main.cpp" \
  "$REF/src/controllers/mpc/qr_mpc_interface.cpp" \
  -I"$HERE" \
  -I"$REF/include/quadruped" \
  -I"$REF/extern/qpOASES" \
  -I"$REF/extern/qpOASES/include" \
  -I"$EIGEN" -I"$OUT" \
  "$OUT/libqpoases.a" 2> "$OUT/build.log" || {
    echo "BUILD FAILED"; tail -30 "$OUT/build.log"; exit 3; }
echo "$OUT/mpc_golden"

echo "building force-balance oracle..."
cat > "$OUT/qtpu_prelude.h" <<'PRELUDE'
// isnan is used unqualified in qr_qp_torque_optimizer.cpp:280,:378
// (catkin pulls it in transitively); provide it for the standalone build.
#include <cmath>
using std::isnan;
PRELUDE
g++ -O2 -std=c++14 -o "$OUT/fb_golden" \
  -include "$OUT/qtpu_prelude.h" \
  "$HERE/fb_golden_main.cpp" \
  "$REF/src/controllers/balance_controller/qr_qp_torque_optimizer.cpp" \
  "$REF/extern/QuadProgpp/src/QuadProg++.cc" \
  "$REF/extern/QuadProgpp/src/Array.cc" \
  -I"$HERE" \
  -I"$REF/include/quadruped" \
  -I"$REF" \
  -I"$REF/config" \
  -I"$REF/extern/QuadProgpp/src" \
  -I"$EIGEN" -I"$OUT" 2> "$OUT/build_fb.log" || {
    echo "FB BUILD FAILED"; tail -30 "$OUT/build_fb.log"; exit 3; }
echo "$OUT/fb_golden"
