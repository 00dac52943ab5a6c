#!/usr/bin/env bash
# Build the REFERENCE CLI (/root/reference, "Lumice") as a ground-truth
# oracle binary for the parity battery. The reference's committed e2e
# reference images are git-lfs pointers in this environment (zero egress),
# so the only way to get true reference output is to build its CPU CLI and
# render the scenes here. Out-of-tree object build; the reference tree is
# read-only and untouched.
#
# Deps that CPM would normally fetch are satisfied offline:
#   - nlohmann/json: tensorflow's vendored 3.11.3 (shims/nlohmann forwards)
#   - spdlog: minimal API-compatible shim (shims/spdlog)
#   - stb_image_write: PPM-writing shim (PIL reads PPM transparently)
#   - tl-expected / GoogleTest / ImGui: GUI+test only, not needed for CLI
set -euo pipefail

REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD="${1:-$HERE/build}"
mkdir -p "$BUILD/obj"

SRCS=(
  config/color_class_table.cpp config/color_gate_table.cpp
  config/component_table.cpp config/config_manager.cpp
  config/crystal_config.cpp config/filter_config.cpp
  config/light_config.cpp config/proj_config.cpp
  config/raypath_color_config.cpp config/raypath_validation.cpp
  config/render_config.cpp config/sim_data.cpp
  core/backend/cpu_trace_backend.cpp core/crystal.cpp
  core/device_filter_desc.cpp core/filter_spec.cpp core/geo3d.cpp
  core/geo3d_closedform.cpp core/lat_lut.cpp core/math.cpp
  core/optics.cpp core/projection.cpp core/raypath.cpp core/simulator.cpp
  server/c_api.cpp server/component_compositor.cpp server/render.cpp
  server/server.cpp server/show_rays.cpp server/stats.cpp
  util/color_space.cpp util/cpu_info.cpp util/env_knobs.cpp
  util/illuminant.cpp util/threading_pool.cpp
  main.cpp
)

CXXFLAGS=(-std=c++17 -O2 -march=native -fexceptions -frtti -pthread
  -I"$REF/src" -I"$REF/src/include" -I"$HERE/shims"
  -D__STDC_FORMAT_MACROS -w)

pids=()
objs=()
for s in "${SRCS[@]}"; do
  o="$BUILD/obj/$(echo "$s" | tr / _ | sed 's/\.cpp$/.o/')"
  objs+=("$o")
  if [[ ! -f "$o" || "$REF/src/$s" -nt "$o" ]]; then
    g++ "${CXXFLAGS[@]}" -c "$REF/src/$s" -o "$o" &
    pids+=($!)
    # cap parallelism
    if (( ${#pids[@]} >= $(nproc) )); then
      wait "${pids[0]}" || exit 1
      pids=("${pids[@]:1}")
    fi
  fi
done
for p in "${pids[@]}"; do wait "$p" || exit 1; done

g++ "${objs[@]}" -o "$BUILD/lumice_ref" -pthread
echo "built $BUILD/lumice_ref"
