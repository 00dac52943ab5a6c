/* smoke.c — standalone C front-end over libiht.
 *
 * Exercises the full C API surface without a Python host process (libiht
 * initializes the embedded interpreter itself): create server, commit a
 * tiny scene, wait idle, read back the frame, print a summary line.
 * Exit code 0 = every check passed. Mirrors the role of the reference CLI
 * as a C-API consumer (/root/reference/src/main.cpp uses only lumice.h).
 *
 * Usage: iht_smoke <scene.json> [ray_num]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "iht.h"

#define CHECK(cond, msg)                              \
  do {                                                \
    if (!(cond)) {                                    \
      fprintf(stderr, "FAIL: %s (%s)\n", msg,         \
              IHT_LastError());                       \
      return 1;                                       \
    }                                                 \
  } while (0)

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <scene.json>\n", argv[0]);
    return 2;
  }

  CHECK(IHT_ApiVersion() == IHT_API_VERSION, "api version");
  CHECK(IHT_IsLegalFace(IHT_CRYSTAL_PRISM, 3) == 1, "legal face 3");
  CHECK(IHT_IsLegalFace(IHT_CRYSTAL_PRISM, 13) == 0, "prism face 13 illegal");
  CHECK(IHT_ValidateRaypathText("3-5-1", -1) == IHT_RAYPATH_VALID, "raypath ok");
  CHECK(IHT_ValidateRaypathText("3--5", -1) == IHT_RAYPATH_INVALID, "raypath bad");

  IHT_Server* server = NULL;
  CHECK(IHT_CreateServer(&server, 7u, 16384) == IHT_OK, "create server");

  int reused = -1;
  CHECK(IHT_CommitSceneFile(server, argv[1], &reused) == IHT_OK, "commit");
  CHECK(reused == 0, "first commit must not reuse");

  CHECK(IHT_WaitIdle(server, 600.0) == IHT_OK, "wait idle");
  CHECK(IHT_QueryServerState(server) == IHT_STATE_IDLE, "state idle");
  long long rays = IHT_GetSimRayCount(server);
  CHECK(rays > 0, "ray count > 0");

  IHT_ResultFrame* frame = NULL;
  CHECK(IHT_AcquireResultFrame(server, &frame) == IHT_OK, "acquire frame");
  CHECK(IHT_FrameIsIdle(frame) == 1, "frame idle");
  int n = IHT_FrameGetRenderCount(frame);
  CHECK(n >= 1, "render count");

  int w = 0, h = 0;
  CHECK(IHT_FrameGetRenderSize(frame, 0, &w, &h) == IHT_OK, "render size");
  CHECK(w > 0 && h > 0, "positive size");

  unsigned char* rgb = (unsigned char*)malloc((size_t)w * h * 3);
  float* xyz = (float*)malloc((size_t)w * h * 3 * sizeof(float));
  CHECK(rgb != NULL && xyz != NULL, "alloc");
  CHECK(IHT_FrameGetRender(frame, 0, rgb, (size_t)w * h * 3) == IHT_OK,
        "get render");
  CHECK(IHT_FrameGetRawXyz(frame, 0, xyz, (size_t)w * h * 3) == IHT_OK,
        "get raw xyz");
  CHECK(IHT_FrameGetRender(frame, 0, rgb, 16) == IHT_ERR_BUFFER_TOO_SMALL,
        "short buffer detected");

  long long lit = 0;
  double xyz_sum = 0.0;
  for (long long i = 0; i < (long long)w * h * 3; ++i) {
    if (rgb[i] > 10) lit++;
    xyz_sum += xyz[i];
  }
  CHECK(lit > 0, "image has content");
  CHECK(xyz_sum > 0.0, "xyz accumulated");

  IHT_Stats stats;
  CHECK(IHT_FrameGetStats(frame, &stats) == IHT_OK, "stats");
  CHECK(stats.rays_traced >= rays, "stats ray count");

  printf("iht_smoke OK: rays=%lld render=%dx%d lit_channels=%lld gen=%lld\n",
         stats.rays_traced, w, h, lit, IHT_FrameGetGeneration(frame));

  CHECK(IHT_ReleaseResultFrame(frame) == IHT_OK, "release frame");
  CHECK(IHT_DestroyServer(server) == IHT_OK, "destroy server");
  free(rgb);
  free(xyz);
  return 0;
}
