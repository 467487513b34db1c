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

#include <random>

// ---------------------------------------------------------------------------
// BERT-style sentence-pack mappings (reference helpers.cpp build_mapping:215
// and build_blocks_mapping:481 — independent C-ABI re-implementation).
//
// Two-call protocol (no pybind): call with out=nullptr to COUNT samples,
// allocate num*stride int64s in Python, call again to FILL + shuffle.
// ---------------------------------------------------------------------------

static inline int32_t target_len(int32_t short_ratio, int32_t max_len,
                                 std::mt19937& gen) {
  // with probability 1/short_ratio pick a short target in [2, max_len]
  if (short_ratio > 0 && (int32_t)(gen() % short_ratio) == 0) {
    return 2 + (int32_t)(gen() % (uint32_t)(max_len - 1));
  }
  return max_len;
}

extern "C" {

// docs: sentence-index offsets per document, length n_docs+1;
// sizes: tokens per sentence. Emits (start_sent, end_sent, target_seq_len)
// triplets: greedy packing of consecutive sentences up to a (possibly
// randomly shortened) target length, repeated for num_epochs, capped at
// max_num_samples, Fisher-Yates shuffled. Returns the sample count.
int64_t build_bert_mapping(const int64_t* docs, const int32_t* sizes,
                           int64_t n_docs, int32_t num_epochs,
                           int64_t max_num_samples, int32_t max_seq_length,
                           double short_seq_prob, int32_t seed,
                           int32_t min_num_sent, int32_t long_sentence_len,
                           int64_t* out) {
  int32_t short_ratio =
      short_seq_prob > 0 ? (int32_t)(1.0 / short_seq_prob + 0.5) : 0;
  std::mt19937 gen(seed);
  int64_t map_index = 0;
  for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
    if (map_index >= max_num_samples) break;
    for (int64_t doc = 0; doc < n_docs; ++doc) {
      const int64_t first = docs[doc], last = docs[doc + 1];
      int64_t remain = last - first;
      // skip docs that are too small or contain over-long sentences
      bool long_sent = false;
      for (int64_t s = first; s < last; ++s) {
        if (sizes[s] > long_sentence_len) { long_sent = true; break; }
      }
      if (remain < min_num_sent || long_sent) continue;
      int64_t prev_start = first;
      int32_t seq_len = 0, num_sent = 0;
      int32_t tgt = target_len(short_ratio, max_seq_length, gen);
      for (int64_t s = first; s < last; ++s) {
        seq_len += sizes[s];
        ++num_sent;
        --remain;
        if (((seq_len >= tgt) && (remain > 1) && (num_sent >= min_num_sent)) ||
            remain == 0) {
          if (out != nullptr && map_index < max_num_samples) {
            out[3 * map_index] = prev_start;
            out[3 * map_index + 1] = s + 1;
            out[3 * map_index + 2] = tgt;
          }
          ++map_index;
          prev_start = s + 1;
          tgt = target_len(short_ratio, max_seq_length, gen);
          seq_len = 0;
          num_sent = 0;
        }
      }
    }
  }
  if (map_index > max_num_samples) map_index = max_num_samples;
  if (out != nullptr) {
    std::mt19937_64 gen64(seed + 1);
    for (int64_t i = map_index - 1; i > 0; --i) {
      const int64_t j = (int64_t)(gen64() % (uint64_t)(i + 1));
      for (int k = 0; k < 3; ++k) {
        int64_t t = out[3 * i + k];
        out[3 * i + k] = out[3 * j + k];
        out[3 * j + k] = t;
      }
    }
  }
  return map_index;
}

// ICT/retrieval blocks: like build_bert_mapping but the per-document title
// (titles_sizes[doc]) is budgeted out of the block and each sample carries
// its source document + a unique block id:
// (start_sent, end_sent, doc, block_id) 4-tuples.
int64_t build_blocks_mapping(const int64_t* docs, const int32_t* sizes,
                             const int32_t* titles_sizes, int64_t n_docs,
                             int32_t num_epochs, int64_t max_num_samples,
                             int32_t max_seq_length, int32_t seed,
                             int32_t use_one_sent_blocks, int64_t* out) {
  const int32_t min_num_sent = use_one_sent_blocks ? 1 : 2;
  std::mt19937 gen(seed);
  (void)gen;
  int64_t map_index = 0, block_id = 0;
  for (int32_t epoch = 0; epoch < num_epochs; ++epoch) {
    if (map_index >= max_num_samples) break;
    for (int64_t doc = 0; doc < n_docs; ++doc) {
      const int64_t first = docs[doc], last = docs[doc + 1];
      int64_t remain = last - first;
      const int32_t tgt = max_seq_length - titles_sizes[doc];
      if (remain < min_num_sent || tgt <= 0) continue;
      int64_t prev_start = first;
      int32_t seq_len = 0, num_sent = 0;
      for (int64_t s = first; s < last; ++s) {
        seq_len += sizes[s];
        ++num_sent;
        --remain;
        if (((seq_len >= tgt) && (remain >= min_num_sent) &&
             (num_sent >= min_num_sent)) ||
            remain == 0) {
          if (out != nullptr && map_index < max_num_samples) {
            out[4 * map_index] = prev_start;
            out[4 * map_index + 1] = s + 1;
            out[4 * map_index + 2] = doc;
            out[4 * map_index + 3] = block_id;
          }
          ++map_index;
          ++block_id;
          prev_start = s + 1;
          seq_len = 0;
          num_sent = 0;
        }
      }
    }
  }
  if (map_index > max_num_samples) map_index = max_num_samples;
  if (out != nullptr) {
    std::mt19937_64 gen64(seed + 1);
    for (int64_t i = map_index - 1; i > 0; --i) {
      const int64_t j = (int64_t)(gen64() % (uint64_t)(i + 1));
      for (int k = 0; k < 4; ++k) {
        int64_t t = out[4 * i + k];
        out[4 * i + k] = out[4 * j + k];
        out[4 * j + k] = t;
      }
    }
  }
  return map_index;
}

}  // extern "C" (continued)
