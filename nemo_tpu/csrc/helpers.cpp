// Dataset index builders (native).
//
// TPU-native equivalent of the reference's pybind11 helpers
// (nemo/collections/nlp/data/language_modeling/megatron/helpers.cpp:
// build_sample_idx:98, build_blending_indices:35) — same algorithms
// (sample/shuffle index construction over memory-mapped token bins,
// weighted multi-dataset blending), exposed through a plain C ABI for
// ctypes (pybind11 is not available in this image).
//
// Build: g++ -O3 -shared -fPIC helpers.cpp -o libnemo_tpu_helpers.so

#include <cstdint>
#include <cmath>

extern "C" {

// Map each training sample k (a seq_length+1 token window) to its starting
// (document-position-in-doc_idx, offset-within-document). Documents are
// concatenated in doc_idx order; samples tile the token stream.
// out has (num_samples + 1) rows of 2 int64s.
void build_sample_idx(const int32_t* sizes,
                      const int64_t* doc_idx,
                      int64_t doc_idx_len,
                      int32_t seq_length,
                      int64_t num_samples,
                      int64_t* out) {
  int64_t doc_pos = 0;      // index into doc_idx
  int64_t doc_offset = 0;   // token offset within current document
  out[0] = doc_pos;
  out[1] = doc_offset;
  for (int64_t k = 1; k <= num_samples; ++k) {
    int64_t remaining = seq_length;
    while (remaining > 0 && doc_pos < doc_idx_len) {
      int64_t doc_len = (int64_t)sizes[doc_idx[doc_pos]] - doc_offset;
      if (doc_len > remaining) {
        doc_offset += remaining;
        remaining = 0;
      } else {
        remaining -= doc_len;
        doc_offset = 0;
        ++doc_pos;
      }
    }
    if (doc_pos >= doc_idx_len) {  // clamp (shouldn't happen with enough epochs)
      doc_pos = doc_idx_len - 1;
      doc_offset = 0;
    }
    out[2 * k] = doc_pos;
    out[2 * k + 1] = doc_offset;
  }
}

// Assign each global sample to a dataset so that realized proportions track
// `weights` (greedy error-minimizing assignment, same scheme as reference
// build_blending_indices).
void build_blending_indices(int16_t* dataset_index,
                            int64_t* dataset_sample_index,
                            const double* weights,
                            int32_t num_datasets,
                            int64_t size) {
  int64_t* counts = new int64_t[num_datasets];
  for (int32_t i = 0; i < num_datasets; ++i) counts[i] = 0;
  for (int64_t k = 0; k < size; ++k) {
    double sample_count = (double)(k + 1);
    int32_t best = 0;
    double best_err = weights[0] * sample_count - (double)counts[0];
    for (int32_t d = 1; d < num_datasets; ++d) {
      double err = weights[d] * sample_count - (double)counts[d];
      if (err > best_err) {
        best_err = err;
        best = d;
      }
    }
    dataset_index[k] = (int16_t)best;
    dataset_sample_index[k] = counts[best];
    counts[best] += 1;
  }
  delete[] counts;
}

}  // extern "C"
