// Native test-harness CLI: drives the backend through its C ABI exactly
// like the external HEBench Test Harness drives the reference plugin
// (/root/reference README.md:103-105): seeded pseudo-random inputs,
// cleartext ground truth computed harness-side, decrypted-output
// comparison, and the CI contract line "Failed: 0"
// (.github/workflows/validate_testharness_output.sh:7-13).
//
// Usage: rsb_native_harness [--poly N] [--n n] [--seed s] [bench ...]
// Default benches: ckks_eltwise_add_latency ckks_eltwise_mult_latency
//                  ckks_dot_product_latency
// Requires PYTHONPATH to include the repo root (the embedded interpreter
// imports reference_seal_backend_tpu).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "rsb_tpu_backend.h"

namespace {

// xorshift-based deterministic doubles in [-1, 1)
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 1) {}
  double next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return static_cast<double>(s % 2000001) / 1000000.0 - 1.0;
  }
};

std::string json_vector(const std::vector<double> &v) {
  std::string out = "[";
  char buf[32];
  for (size_t i = 0; i < v.size(); ++i) {
    snprintf(buf, sizeof buf, "%.17g", v[i]);
    out += buf;
    if (i + 1 < v.size()) out += ",";
  }
  out += "]";
  return out;
}

// Extract every number from a JSON string (enough to validate flat
// result arrays without a JSON dependency).
std::vector<double> parse_numbers(const char *s) {
  std::vector<double> out;
  while (*s) {
    if ((*s >= '0' && *s <= '9') || *s == '-') {
      char *end = nullptr;
      out.push_back(std::strtod(s, &end));
      s = end;
    } else {
      ++s;
    }
  }
  return out;
}

void print_error(const char *where) {
  char *err = rsbtpu_last_error();
  fprintf(stderr, "[ Error  ] %s: %s\n", where, err ? err : "?");
  rsbtpu_free(err);
}

bool run_one(int64_t engine, const std::string &name, int poly, int n,
             uint64_t seed) {
  char params[128];
  snprintf(params, sizeof params,
           "{\"poly_modulus_degree\": %d, \"n\": %d}", poly, n);
  int64_t bench = rsbtpu_benchmark_create(engine, name.c_str(), params);
  if (bench < 0) {
    print_error("benchmark_create");
    return false;
  }

  Rng rng(seed);
  std::vector<double> a(n), b(n);
  for (int i = 0; i < n; ++i) a[i] = rng.next();
  for (int i = 0; i < n; ++i) b[i] = rng.next();

  const bool is_add = name.find("add") != std::string::npos;
  const bool is_dot = name.find("dot") != std::string::npos;
  std::vector<double> want;
  if (is_dot) {
    double acc = 0;
    for (int i = 0; i < n; ++i) acc += a[i] * b[i];
    want.push_back(acc);
  } else {
    for (int i = 0; i < n; ++i)
      want.push_back(is_add ? a[i] + b[i] : a[i] * b[i]);
  }

  // one sample per op param (Latency)
  std::string inputs =
      "[[" + json_vector(a) + "],[" + json_vector(b) + "]]";

  int64_t h = rsbtpu_encode(bench, inputs.c_str());
  const char *step = "encode";
  if (h >= 0) { h = rsbtpu_encrypt(bench, h); step = "encrypt"; }
  if (h >= 0) { h = rsbtpu_load(bench, h); step = "load"; }
  if (h >= 0) { h = rsbtpu_operate(bench, h); step = "operate"; }
  if (h >= 0) { h = rsbtpu_store(bench, h); step = "store"; }
  if (h >= 0) { h = rsbtpu_decrypt(bench, h); step = "decrypt"; }
  if (h < 0) {
    print_error(step);
    rsbtpu_benchmark_destroy(bench);
    return false;
  }
  char *out_json = rsbtpu_decode(bench, h);
  if (!out_json) {
    print_error("decode");
    rsbtpu_benchmark_destroy(bench);
    return false;
  }
  std::vector<double> got = parse_numbers(out_json);
  rsbtpu_free(out_json);
  rsbtpu_benchmark_destroy(bench);

  if (got.size() < want.size()) {
    fprintf(stderr, "[ Error  ] %s: got %zu values, want %zu\n",
            name.c_str(), got.size(), want.size());
    return false;
  }
  for (size_t i = 0; i < want.size(); ++i) {
    double tol = 5e-4 * (1.0 + std::fabs(want[i]));
    if (std::fabs(got[i] - want[i]) > tol) {
      fprintf(stderr, "[ Error  ] %s: mismatch at %zu: %g vs %g\n",
              name.c_str(), i, got[i], want[i]);
      return false;
    }
  }
  printf("[ OK     ] %s\n", name.c_str());
  return true;
}

}  // namespace

int main(int argc, char **argv) {
  setvbuf(stdout, nullptr, _IONBF, 0);  // keep progress visible on crash
  int poly = 2048, n = 100;
  uint64_t seed = 1234;
  std::vector<std::string> benches;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--poly") && i + 1 < argc) poly = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--n") && i + 1 < argc) n = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--seed") && i + 1 < argc)
      seed = strtoull(argv[++i], nullptr, 10);
    else benches.push_back(argv[i]);
  }
  if (benches.empty())
    benches = {"ckks_eltwise_add_latency", "ckks_eltwise_mult_latency",
               "ckks_dot_product_latency"};

  if (rsbtpu_api_version_check(RSBTPU_API_VERSION_MAJOR,
                               RSBTPU_API_VERSION_MINOR,
                               RSBTPU_API_VERSION_REVISION) != 0) {
    fprintf(stderr, "[ Error  ] backend API version incompatible\n");
    return 2;
  }
  if (rsbtpu_initialize() != 0) {
    print_error("initialize");
    return 2;
  }
  int64_t engine = rsbtpu_engine_create();
  if (engine < 0) {
    print_error("engine_create");
    return 2;
  }
  printf("[ Info    ] Engine created; %lld benchmarks registered\n",
         static_cast<long long>(rsbtpu_benchmark_count(engine)));

  int failed = 0;
  for (const auto &name : benches)
    if (!run_one(engine, name, poly, n, seed)) ++failed;

  printf("[ Info    ] Total: %zu\n", benches.size());
  printf("[ Info    ] Failed: %d\n", failed);
  rsbtpu_engine_destroy(engine);
  return failed ? 1 : 0;
}
