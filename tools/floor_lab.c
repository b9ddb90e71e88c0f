// Pure-compute floor lab for the host decode synthesis cascade.
//
// Measures the port-mix speed-of-light of the two sample-serial passes
// (PARCOR lattice synthesis, sign-sign LMS synthesis) with ALL memory
// I/O removed: the per-sample input is a register chain, so the loop is
// exactly the kernels' arithmetic and nothing else. Compares against the
// op-mix throughput of this core measured with independent op chains.
// The gap between these floors and the in-kernel pass costs reported by
// tools/bench_synth_micro.py is the (tile-I/O + transpose) overhead —
// everything else is irreducible under the format's exact arithmetic
// (reference ops per row-sample: 2p lattice multiplies
// /root/reference/src/SLAPredictor.c:634-650, 4M LMS multiply-adds
// SLAPredictor.c:1202-1463, both wrapping int32).
//
// Build + run (standalone, not part of the library):
//   gcc -O3 -march=native -funroll-loops -fwrapv -x c++ \
//       tools/floor_lab.c -o /tmp/floor_lab && /tmp/floor_lab
#include <stdio.h>
#include <string.h>
#include <time.h>
#include <immintrin.h>

typedef int v16 __attribute__((vector_size(64)));
#define KEEP(x) __asm__ volatile("" : "+x"(x))
static double now(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
}
#define N 12288
#define R 16
static volatile int sink32;

// ---- op-mix throughput of one lattice stage (2 mul + 2 shift + 3 add
// class), independent chains: the per-stage port bound of this core
static double stage_mix(void) {
  __m512i b = _mm512_set1_epi32(7);
  __m512i x0 = b, x1 = b, x2 = b, x3 = b, x4 = b, x5 = b, x6 = b;
  long iters = 50000000L;
  double t0 = now();
  for (long i = 0; i < iters; ++i) {
    x0 = _mm512_mullo_epi32(x0, b); KEEP(x0);
    x1 = _mm512_mullo_epi32(x1, b); KEEP(x1);
    x2 = _mm512_srai_epi32(x2, 1);  KEEP(x2);
    x3 = _mm512_srai_epi32(x3, 1);  KEEP(x3);
    x4 = _mm512_add_epi32(x4, b);   KEEP(x4);
    x5 = _mm512_add_epi32(x5, b);   KEEP(x5);
    x6 = _mm512_add_epi32(x6, b);   KEEP(x6);
  }
  double dt = now() - t0;
  sink32 = _mm512_reduce_add_epi32(_mm512_add_epi32(x0, x6));
  return dt / iters;  // seconds per (2M+2S+3A) stage bundle, 16 lanes
}

// ---- lattice synthesis, pure compute (p = 16): the repo kernel's exact
// per-sample arithmetic (sla_native.cpp lattice_synth_genT) on a register
// input chain
static double lattice_pure(int reps) {
  static int32_t coef[R * 16];
  srand(7);
  for (int i = 0; i < R * 16; ++i) coef[i] = rand() % 4000 - 2000;
  const int P = 16;
  double best = 1e9;
  for (int rep = 0; rep < reps; ++rep) {
    v16 c[16], lat[17], deemph = {};
    const v16 half = ((v16){} + (1 << 14));
    for (int k = 0; k < P; ++k)
      for (int r = 0; r < R; ++r) c[k][r] = coef[r * P + k];
    for (int k = 0; k <= P; ++k) lat[k] = (v16){};
    v16 y = ((v16){} + 123);
    double t0 = now();
    for (int s = 0; s < N; ++s) {
      v16 f = y + ((c[P - 1] * lat[P - 1] + half) >> 15);
      lat[P] = lat[P - 1] - ((c[P - 1] * f + half) >> 15);
      for (int k = P - 2; k >= 0; --k) {
        f += (c[k] * lat[k] + half) >> 15;
        lat[k + 1] = lat[k] - ((c[k] * f + half) >> 15);
      }
      v16 v = f;
      lat[0] = v;
      v += (deemph * 31) >> 5;
      deemph = v;
      y = v ^ (y >> 1);  // register dependency chain instead of memory
    }
    double dt = now() - t0;
    sink32 = y[0] + y[7] + y[15];
    if (dt < best) best = dt;
  }
  return best / ((double)R * N) * 1e9;
}

// ---- sign-sign LMS synthesis, pure compute (M = 8): the ring-form
// arithmetic on a register input chain
static double lms_pure(int reps) {
  const int M = 8;
  double best = 1e9;
  for (int rep = 0; rep < reps; ++rep) {
    const v16 vzero = {};
    v16 fc[8], ic[8];
    for (int i = 0; i < M; ++i) { fc[i] = vzero; ic[i] = vzero; }
    static v16 xd[128], pd[128], xs[128], ps[128];
    for (int i = 0; i < 128; ++i) {
      xd[i] = vzero; pd[i] = vzero; xs[i] = vzero; ps[i] = vzero;
    }
    int xpos = 64;
    v16 y = ((v16){} + 123);
    double t0 = now();
    for (int s = 0; s < N; ++s) {
      v16 in_v = y;
      const v16* xb = xd + xpos;
      const v16* pb = pd + xpos;
      v16 acc = vzero + 512;
      for (int i = 0; i < M; ++i) acc += fc[i] * xb[i] + ic[i] * pb[i];
      v16 pred = acc >> 10;
      int warm = s < M;
      v16 res = in_v, x = in_v + pred;
      if (!warm) {
        v16 mag0 = res < vzero ? -res : res;
        __m512i lz = _mm512_lzcnt_epi32(_mm512_loadu_si512((void*)&mag0));
        v16 bl;
        _mm512_storeu_si512((void*)&bl, lz);
        bl = (vzero + 32) - bl;
        v16 step = ((res < vzero) - (res > vzero)) * (bl >> 1);
        const v16* xsb = xs + xpos;
        const v16* psb = ps + xpos;
        for (int i = 0; i < M; ++i) { fc[i] += step * xsb[i]; ic[i] += step * psb[i]; }
      }
      if (xpos == 0) {
        for (int i = M - 1; i >= 0; --i) {
          xd[64 + i] = xd[i]; pd[64 + i] = pd[i];
          xs[64 + i] = xs[i]; ps[64 + i] = ps[i];
        }
        xpos = 64;
      }
      --xpos;
      v16 pnew = warm ? x : pred;
      xd[xpos] = x; pd[xpos] = pnew;
      xs[xpos] = (x < vzero) - (x > vzero);
      ps[xpos] = (pnew < vzero) - (pnew > vzero);
      v16 emit = warm ? in_v : x;
      y = emit ^ (y >> 1);
    }
    double dt = now() - t0;
    sink32 = y[0] + y[7] + y[15];
    if (dt < best) best = dt;
  }
  return best / ((double)R * N) * 1e9;
}

int main(void) {
  double mix = stage_mix();
  double lat = lattice_pure(9);
  double lms = lms_pure(9);
  // port-mix bound for p=16 lattice: 16 stage bundles per sample, 16 rows
  double bound = mix * 16.0 / R * 1e9;
  printf("stage op-mix (2M+2S+3A, indep): %.2f ns/bundle\n", mix * 1e9);
  printf("lattice p=16 port-mix bound:    %.2f ns/row-sample\n", bound);
  printf("lattice p=16 pure compute:      %.2f ns/row-sample\n", lat);
  printf("LMS M=8 pure compute:           %.2f ns/row-sample\n", lms);
  printf("(compare tools/bench_synth_micro.py in-kernel pass costs: the\n"
         " difference is tile I/O + transposes; ops are irreducible)\n");
  return 0;
}
