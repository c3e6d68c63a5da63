// spatten_cost — native analytical performance model for the TPU engine.
//
// The reference ships a C++ behavioral simulator (spatten_hardware/
// simulator/src/bert.cpp) that prices each layer as DRAM transactions +
// pipeline fill/drain + software top-k cycles.  The TPU analog is a
// roofline: every attention request (one workload-trace row) moves
// `key_fetch * D * kbit/8` + `val_fetch * D * vbit/8` bytes of HBM and does
// `2 * (key_fetch + val_fetch) * D` MACs; a decode step is priced at
// max(bytes / HBM_BW, flops / peak) + a fixed kernel-launch overhead, with
// the model's weight streaming added per step.
//
// Exposed as a C ABI over parallel arrays so the Python wrapper (ctypes,
// spatten_tpu/perf/cost_model.py) can replay multi-million-row traces
// (the reference's published CSVs are ~33k rows) in native speed.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

struct SpattenHw {
  double hbm_gbps;          // sustained HBM bandwidth, bytes/s * 1e-9
  double peak_tflops;       // usable matmul throughput (decode is VPU/MXU
                            // mixed; use the de-rated small-matmul number)
  double step_overhead_us;  // per decode-step launch/dispatch overhead
  double weight_bytes_per_step;   // streamed weights+activations per step
  double scale_bytes_per_elem;    // per fetched token: scale metadata
  double requant_refetch_factor;  // extra key-plane fraction on requant
                                  // (int8 full / 4-bit msb = 2.0)
};

struct SpattenCost {
  double total_bytes;
  double total_flops;
  double total_seconds;
  double tokens_per_s;
  int64_t iterations;
};

// Rows must be sorted so that rows of one iteration are contiguous
// (the natural CSV order).  Arrays are length n.
void spatten_cost_model(const int64_t* iteration_id,
                        const int64_t* key_fetch,
                        const int64_t* val_fetch,
                        const int64_t* kbit,        // -1 => 16-bit baseline
                        const int64_t* vbit,
                        const uint8_t* if_requant,
                        const double* head_dim,
                        int64_t n,
                        const SpattenHw* hw,
                        SpattenCost* out) {
  double total_bytes = 0.0, total_flops = 0.0, total_seconds = 0.0;
  int64_t iterations = 0;

  double it_bytes = 0.0, it_flops = 0.0;
  int64_t cur_it = n > 0 ? iteration_id[0] : 0;

  auto flush_iteration = [&]() {
    double bytes = it_bytes + hw->weight_bytes_per_step;
    double t_mem = bytes / (hw->hbm_gbps * 1e9);
    double t_cmp = it_flops / (hw->peak_tflops * 1e12);
    total_seconds += std::max(t_mem, t_cmp) + hw->step_overhead_us * 1e-6;
    total_bytes += bytes;
    total_flops += it_flops;
    iterations += 1;
    it_bytes = 0.0;
    it_flops = 0.0;
  };

  for (int64_t i = 0; i < n; ++i) {
    if (iteration_id[i] != cur_it) {
      flush_iteration();
      cur_it = iteration_id[i];
    }
    const double D = head_dim[i];
    const double kb = kbit[i] < 0 ? 16.0 : static_cast<double>(kbit[i]);
    const double vb = vbit[i] < 0 ? 16.0 : static_cast<double>(vbit[i]);
    double key_bytes = key_fetch[i] * D * kb / 8.0 +
                       key_fetch[i] * hw->scale_bytes_per_elem;
    if (if_requant[i]) {
      key_bytes *= (1.0 + hw->requant_refetch_factor);
    }
    const double val_bytes = val_fetch[i] * D * vb / 8.0 +
                             val_fetch[i] * hw->scale_bytes_per_elem;
    it_bytes += key_bytes + val_bytes;
    // QK^T + P·V MACs (x2 for requant recompute)
    double flops = 2.0 * (key_fetch[i] + val_fetch[i]) * D;
    if (if_requant[i]) flops += 2.0 * key_fetch[i] * D;
    it_flops += flops;
  }
  if (n > 0) flush_iteration();

  out->total_bytes = total_bytes;
  out->total_flops = total_flops;
  out->total_seconds = total_seconds;
  out->tokens_per_s = total_seconds > 0 ? iterations / total_seconds : 0.0;
  out->iterations = iterations;
}

// Aggregate helper: bytes moved by a single dense (unpruned, 16-bit)
// run of the same trace — the denominator for "DRAM access reduction"
// (the paper's ~10x headline, arXiv:2012.09852 via README.md:5).
void spatten_dense_bytes(const int64_t* iteration_id,
                         const int64_t* sentence_len,
                         const double* head_dim,
                         int64_t n,
                         double* out_bytes) {
  double bytes = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    bytes += 2.0 * sentence_len[i] * head_dim[i] * 2.0;  // K+V, fp16
  }
  *out_bytes = bytes;
}

}  // extern "C"
