/* C ABI of the TPU-native HE benchmark backend.
 *
 * The runtime counterpart of the reference backend's HEBench API Bridge
 * surface (engine create/destroy + benchmark lifecycle + the 7-step
 * encode/encrypt/load/operate/store/decrypt/decode pipeline — see
 * /root/reference src/engine/seal_engine.cpp:36-83 and SURVEY.md L1/L2).
 * All objects are opaque int64 ids; cleartext crosses as JSON; errors are
 * returned as negative ids with the message readable via
 * rsbtpu_last_error().
 */
#ifndef RSB_TPU_BACKEND_H
#define RSB_TPU_BACKEND_H

#include <stdint.h>

/* Backend API version (the analogue of the reference's generated
 * seal_version.h + the createEngine compatibility gate,
 * /root/reference src/engine/seal_engine.cpp:41-54). */
#define RSBTPU_API_VERSION_MAJOR 1
#define RSBTPU_API_VERSION_MINOR 0
#define RSBTPU_API_VERSION_REVISION 1

#ifdef __cplusplus
extern "C" {
#endif

/* Process-wide init/teardown of the embedded Python runtime.
 * rsbtpu_initialize is idempotent; returns 0 on success. */
int rsbtpu_initialize(void);
void rsbtpu_finalize(void);

/* Version handshake: returns 0 when the caller-required version is
 * compatible (major/minor exact match, library revision >= required —
 * same rule as the reference's createEngine gate), < 0 otherwise. */
int rsbtpu_api_version_check(int major, int minor, int revision);

/* Engine lifecycle. Returns engine id > 0, or < 0 on error. */
int64_t rsbtpu_engine_create(void);
/* createEngine(p_buffer, size) parity: the API-Bridge contract allows
 * opaque engine init data (the reference accepts and ignores it,
 * /root/reference src/engine/seal_engine.cpp:38-40).  Accepted, recorded,
 * not interpreted; NULL/0 is equivalent to rsbtpu_engine_create(). */
int64_t rsbtpu_engine_create_with_data(const uint8_t *p_buffer,
                                       uint64_t size);
void rsbtpu_engine_destroy(int64_t engine);

/* Benchmark registry: count and names of registered descriptors. */
int64_t rsbtpu_benchmark_count(int64_t engine);
/* Copies the name into buf (NUL-terminated, truncated to buf_len).
 * Returns name length or < 0. */
int64_t rsbtpu_benchmark_name(int64_t engine, int64_t index, char *buf,
                              int64_t buf_len);
/* Full descriptor as JSON (workload/scheme/category/security/other,
 * default_params, and cat_params: warmup_iterations_count,
 * min_test_time_ms, offline data_count) — the analogue of the
 * reference's APIBridge BenchmarkDescriptor POD. Same buffer contract
 * as rsbtpu_benchmark_name. */
int64_t rsbtpu_benchmark_descriptor(int64_t engine, int64_t index, char *buf,
                                    int64_t buf_len);

/* Create a benchmark instance by descriptor name with JSON workload
 * params (e.g. {"poly_modulus_degree": 4096, "n": 100}); NULL/"" keeps
 * defaults. */
int64_t rsbtpu_benchmark_create(int64_t engine, const char *name,
                                const char *params_json);
void rsbtpu_benchmark_destroy(int64_t benchmark);

/* 7-step pipeline. Inputs to encode are JSON (list per op-param, each a
 * list of samples / values). Every step returns a new handle id (> 0) or
 * < 0 on error. operate blocks until device work completes. */
int64_t rsbtpu_encode(int64_t benchmark, const char *inputs_json);
int64_t rsbtpu_encrypt(int64_t benchmark, int64_t handle);
int64_t rsbtpu_load(int64_t benchmark, int64_t handle);
int64_t rsbtpu_operate(int64_t benchmark, int64_t handle);
int64_t rsbtpu_store(int64_t benchmark, int64_t handle);
int64_t rsbtpu_decrypt(int64_t benchmark, int64_t handle);
/* Returns a malloc'd JSON string (caller frees with rsbtpu_free) or NULL. */
char *rsbtpu_decode(int64_t benchmark, int64_t handle);

void rsbtpu_handle_destroy(int64_t handle);
void rsbtpu_free(char *p);

/* Last error message for the calling thread's most recent failure
 * (returns a malloc'd string; free with rsbtpu_free). */
char *rsbtpu_last_error(void);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* RSB_TPU_BACKEND_H */
