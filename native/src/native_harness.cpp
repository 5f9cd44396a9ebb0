// Native test-harness CLI: drives the backend through its C ABI exactly
// like the external HEBench Test Harness drives the reference plugin
// (/root/reference README.md:103-105): seeded pseudo-random inputs,
// cleartext ground truth computed harness-side, decrypted-output
// comparison, and the CI contract line "Failed: 0"
// (.github/workflows/validate_testharness_output.sh:7-13).
//
// Covers the FULL registry — all 20 benchmark registrations (CKKS + BFV;
// eltwise, dot, the three matmult packings, logreg; Latency + Offline) —
// matching the reference harness, which drives every registered
// descriptor.
//
// Usage: rsb_native_harness [--poly N] [--n n] [--seed s] [--all] [bench ...]
// Default benches: ckks_eltwise_add_latency ckks_eltwise_mult_latency
//                  ckks_dot_product_latency        (quick smoke subset)
// --all runs every benchmark the engine registers.
// Requires PYTHONPATH to include the repo root (the embedded interpreter
// imports reference_seal_backend_tpu).

#include <chrono>
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
  uint64_t raw() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  double next() {
    return static_cast<double>(raw() % 2000001) / 1000000.0 - 1.0;
  }
  long long next_int(long long hi) {  // in [-hi, hi]
    return static_cast<long long>(raw() % (2 * hi + 1)) - hi;
  }
};

std::string json_doubles(const std::vector<double> &v) {
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

std::string json_ints(const std::vector<long long> &v) {
  std::string out = "[";
  char buf[32];
  for (size_t i = 0; i < v.size(); ++i) {
    snprintf(buf, sizeof buf, "%lld", v[i]);
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

bool has(const std::string &name, const char *needle) {
  return name.find(needle) != std::string::npos;
}

struct Workload {
  std::string params_json;  // benchmark-creation params
  std::string inputs_json;  // encode() inputs
  std::vector<double> want; // flattened expected outputs, result order
  bool exact = false;       // BFV: integer-exact comparison
};

// Build seeded inputs + cleartext ground truth for any registered
// benchmark name (the harness-side oracle of SURVEY.md §4).
Workload make_workload(const std::string &name, int poly, int n_vec,
                       uint64_t seed) {
  Workload w;
  Rng rng(seed);
  const bool is_bfv = has(name, "bfv_");
  const bool offline = has(name, "_offline");
  const int sec = poly >= 8192 ? 128 : 0;  // tiny test N needs the opt-out
  char params[256];
  w.exact = is_bfv;

  if (has(name, "eltwise") || has(name, "dot_product")) {
    const int n = n_vec;
    snprintf(params, sizeof params,
             "{\"poly_modulus_degree\": %d, \"n\": %d, \"sec_level\": %d}",
             poly, n, sec);
    w.params_json = params;
    const int b0 = offline ? 2 : 1, b1 = offline ? 3 : 1;
    // integer range keeps BFV dot products inside the plain modulus
    long long hi = std::max(
        2LL, static_cast<long long>(std::sqrt((1 << 19) / std::max(n, 1))));
    std::vector<std::vector<double>> da(b0), db(b1);
    std::vector<std::vector<long long>> ia(b0), ib(b1);
    std::string s0 = "[", s1 = "[";
    for (int i = 0; i < b0; ++i) {
      for (int k = 0; k < n; ++k) {
        if (is_bfv) ia[i].push_back(rng.next_int(hi));
        else da[i].push_back(rng.next());
      }
      s0 += is_bfv ? json_ints(ia[i]) : json_doubles(da[i]);
      if (i + 1 < b0) s0 += ",";
    }
    for (int j = 0; j < b1; ++j) {
      for (int k = 0; k < n; ++k) {
        if (is_bfv) ib[j].push_back(rng.next_int(hi));
        else db[j].push_back(rng.next());
      }
      s1 += is_bfv ? json_ints(ib[j]) : json_doubles(db[j]);
      if (j + 1 < b1) s1 += ",";
    }
    s0 += "]";
    s1 += "]";
    // inputs = [samples_of_param0, samples_of_param1]
    w.inputs_json = "[" + s0 + "," + s1 + "]";
    const bool is_add = has(name, "add");
    const bool is_dot = has(name, "dot");
    for (int i = 0; i < b0; ++i)
      for (int j = 0; j < b1; ++j) {
        if (is_dot) {
          double acc = 0;
          for (int k = 0; k < n; ++k)
            acc += is_bfv ? double(ia[i][k]) * double(ib[j][k])
                          : da[i][k] * db[j][k];
          w.want.push_back(acc);
        } else {
          for (int k = 0; k < n; ++k) {
            double x = is_bfv ? double(ia[i][k]) : da[i][k];
            double y = is_bfv ? double(ib[j][k]) : db[j][k];
            w.want.push_back(is_add ? x + y : x * y);
          }
        }
      }
    return w;
  }

  if (has(name, "matrix_multiply")) {
    // small dims (the registered defaults are 10x9·9x8; CI-speed 4x3·3x5)
    const int r0 = 4, c0 = 3, c1 = 5;
    snprintf(params, sizeof params,
             "{\"poly_modulus_degree\": %d, \"rows_m0\": %d, \"cols_m0\": %d,"
             " \"cols_m1\": %d, \"sec_level\": %d}",
             poly, r0, c0, c1, sec);
    w.params_json = params;
    const long long hi = 30;
    std::vector<double> m0(r0 * c0), m1(c0 * c1);
    for (auto &x : m0) x = is_bfv ? double(rng.next_int(hi)) : rng.next();
    for (auto &x : m1) x = is_bfv ? double(rng.next_int(hi)) : rng.next();
    auto mat_json = [&](const std::vector<double> &m, int rows, int cols) {
      std::string s = "[";
      for (int i = 0; i < rows; ++i) {
        std::vector<double> row(m.begin() + i * cols,
                                m.begin() + (i + 1) * cols);
        if (is_bfv) {
          std::vector<long long> irow(row.begin(), row.end());
          s += json_ints(irow);
        } else {
          s += json_doubles(row);
        }
        if (i + 1 < rows) s += ",";
      }
      return s + "]";
    };
    w.inputs_json =
        "[" + mat_json(m0, r0, c0) + "," + mat_json(m1, c0, c1) + "]";
    for (int i = 0; i < r0; ++i)
      for (int j = 0; j < c1; ++j) {
        double acc = 0;
        for (int k = 0; k < c0; ++k) acc += m0[i * c0 + k] * m1[k * c1 + j];
        w.want.push_back(acc);
      }
    return w;
  }

  if (has(name, "logistic_regression")) {
    const int n = 16, batch = offline ? 4 : 1;
    snprintf(params, sizeof params,
             "{\"poly_modulus_degree\": %d, \"n\": %d, \"batch_size\": %d,"
             " \"sec_level\": %d}",
             poly, n, batch, sec);
    w.params_json = params;
    std::vector<double> wv(n);
    for (auto &x : wv) x = rng.next();
    double b = rng.next();
    std::vector<std::vector<double>> xs(batch, std::vector<double>(n));
    std::string xjson = "[";
    for (int i = 0; i < batch; ++i) {
      for (auto &x : xs[i]) x = rng.next();
      xjson += json_doubles(xs[i]);
      if (i + 1 < batch) xjson += ",";
    }
    xjson += "]";
    char bbuf[32];
    snprintf(bbuf, sizeof bbuf, "%.17g", b);
    w.inputs_json =
        "[" + json_doubles(wv) + "," + std::string(bbuf) + "," + xjson + "]";
    for (int i = 0; i < batch; ++i) {
      double z = b;
      for (int k = 0; k < n; ++k) z += wv[k] * xs[i][k];
      w.want.push_back(0.5 + 0.15012 * z - 0.0015930078125 * z * z * z);
    }
    return w;
  }

  w.params_json = "";  // unknown benchmark: let benchmark_create fail
  return w;
}

bool run_one(int64_t engine, const std::string &name, int poly, int n,
             uint64_t seed) {
  Workload w = make_workload(name, poly, n, seed);
  int64_t bench =
      rsbtpu_benchmark_create(engine, name.c_str(), w.params_json.c_str());
  if (bench < 0) {
    print_error("benchmark_create");
    return false;
  }

  int64_t h = rsbtpu_encode(bench, w.inputs_json.c_str());
  const char *step = "encode";
  double operate_ms = 0;
  if (h >= 0) { h = rsbtpu_encrypt(bench, h); step = "encrypt"; }
  if (h >= 0) { h = rsbtpu_load(bench, h); step = "load"; }
  if (h >= 0) {
    auto t0 = std::chrono::steady_clock::now();
    h = rsbtpu_operate(bench, h);
    operate_ms = std::chrono::duration<double, std::milli>(
                     std::chrono::steady_clock::now() - t0)
                     .count();
    step = "operate";
  }
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

  if (got.size() < w.want.size()) {
    fprintf(stderr, "[ Error  ] %s: got %zu values, want %zu\n",
            name.c_str(), got.size(), w.want.size());
    return false;
  }
  for (size_t i = 0; i < w.want.size(); ++i) {
    bool ok;
    if (w.exact) {
      ok = std::llround(got[i]) == std::llround(w.want[i]);
    } else {
      double tol = 5e-4 * (1.0 + std::fabs(w.want[i]));
      ok = std::fabs(got[i] - w.want[i]) <= tol;
    }
    if (!ok) {
      fprintf(stderr, "[ Error  ] %s: mismatch at %zu: %g vs %g\n",
              name.c_str(), i, got[i], w.want[i]);
      return false;
    }
  }
  printf("[ OK     ] %s (operate %.1f ms)\n", name.c_str(), operate_ms);
  return true;
}

}  // namespace

int main(int argc, char **argv) {
  setvbuf(stdout, nullptr, _IONBF, 0);  // keep progress visible on crash
  int poly = 2048, n = 100;
  uint64_t seed = 1234;
  bool all = false;
  std::vector<std::string> benches;
  for (int i = 1; i < argc; ++i) {
    if (!strcmp(argv[i], "--poly") && i + 1 < argc) poly = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--n") && i + 1 < argc) n = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--seed") && i + 1 < argc)
      seed = strtoull(argv[++i], nullptr, 10);
    else if (!strcmp(argv[i], "--all")) all = true;
    else benches.push_back(argv[i]);
  }

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
  int64_t count = rsbtpu_benchmark_count(engine);
  printf("[ Info    ] Engine created; %lld benchmarks registered\n",
         static_cast<long long>(count));

  if (all) {
    benches.clear();
    for (int64_t i = 0; i < count; ++i) {
      char buf[128];
      if (rsbtpu_benchmark_name(engine, i, buf, sizeof buf) > 0)
        benches.push_back(buf);
    }
  } else if (benches.empty()) {
    benches = {"ckks_eltwise_add_latency", "ckks_eltwise_mult_latency",
               "ckks_dot_product_latency"};
  }

  int failed = 0;
  for (const auto &name : benches)
    if (!run_one(engine, name, poly, n, seed)) ++failed;

  printf("[ Info    ] Total: %zu\n", benches.size());
  printf("[ Info    ] Failed: %d\n", failed);
  rsbtpu_engine_destroy(engine);
  return failed ? 1 : 0;
}
