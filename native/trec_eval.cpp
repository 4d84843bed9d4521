// Native retrieval-metrics engine (trec_eval semantics).
//
// Plays the role of the pytrec_eval C++ extension the reference's USEB fork
// depends on (biencoder/useb/useb/useb/evaluators/scidocs.py:16): the per-query
// sort + gain loops dominate evaluation cost at BEIR scale (10k+ queries x 1000
// docs); Python dict/sort work is ~30x slower. Exposed via a C ABI for ctypes.
//
// Metrics per (query, k): nDCG@k, MAP@k, Recall@k, Precision@k, MRR@k, Acc@k —
// trec_eval conventions (graded gains for nDCG with negative grades clamped
// to 0, binary grade>0 elsewhere, log2(rank+1) discount, MAP normalized by
// the TOTAL relevant count — map_cut semantics).
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

inline double log2_discount(int rank0) {  // rank0: 0-based rank
  return std::log2(static_cast<double>(rank0) + 2.0);
}

}  // namespace

extern "C" {

// n_queries          number of queries
// offsets            [n_queries+1] prefix offsets into scores/grades
// scores             flattened retrieved-doc scores (unsorted, float64 so
//                    sub-float32 score differences rank exactly like python)
// grades             flattened judged grades for those docs (0 = not relevant)
// n_relevant         [n_queries] total relevant docs (for recall/MAP denominators)
// ideal_offsets      [n_queries+1] prefix offsets into ideal_gains
// ideal_gains        flattened desc-sorted grades of each query's relevant docs
// ks                 [n_ks] cutoffs
// out                [n_queries * n_ks * 6] row-major:
//                    (ndcg, map, recall, precision, mrr, accuracy)
void evaluate_queries(int32_t n_queries, const int64_t* offsets,
                      const double* scores, const int32_t* grades,
                      const int32_t* n_relevant, const int64_t* ideal_offsets,
                      const int32_t* ideal_gains, const int32_t* ks,
                      int32_t n_ks, double* out) {
  std::vector<int32_t> order;
  for (int32_t q = 0; q < n_queries; ++q) {
    const int64_t lo = offsets[q], hi = offsets[q + 1];
    const int32_t n = static_cast<int32_t>(hi - lo);
    order.resize(n);
    std::iota(order.begin(), order.end(), 0);
    // sort by score desc; stable so the caller's tie-break order (doc id desc,
    // trec_eval convention) is preserved — matches the Python path
    std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
      return scores[lo + a] > scores[lo + b];
    });

    const int64_t ilo = ideal_offsets[q], ihi = ideal_offsets[q + 1];
    const int32_t nrel = n_relevant[q];

    for (int32_t ki = 0; ki < n_ks; ++ki) {
      const int32_t k = ks[ki];
      const int32_t depth = std::min(k, n);

      double dcg = 0.0, ap = 0.0, mrr = 0.0;
      int32_t hits = 0;
      for (int32_t r = 0; r < depth; ++r) {
        const int32_t g = grades[lo + order[r]];
        if (g > 0) {
          dcg += static_cast<double>(g) / log2_discount(r);
          ++hits;
          ap += static_cast<double>(hits) / (r + 1);
          if (mrr == 0.0) mrr = 1.0 / (r + 1);
        }
      }
      double ideal = 0.0;
      const int32_t idepth = std::min<int64_t>(k, ihi - ilo);
      for (int32_t r = 0; r < idepth; ++r) {
        ideal += static_cast<double>(ideal_gains[ilo + r]) / log2_discount(r);
      }

      double* row = out + (static_cast<int64_t>(q) * n_ks + ki) * 6;
      row[0] = ideal > 0.0 ? dcg / ideal : 0.0;
      // trec_eval map_cut: divide by TOTAL relevant, not min(nrel, k)
      row[1] = nrel > 0 ? ap / nrel : 0.0;
      row[2] = nrel > 0 ? static_cast<double>(hits) / nrel : 0.0;
      row[3] = k > 0 ? static_cast<double>(hits) / k : 0.0;
      row[4] = mrr;
      row[5] = hits > 0 ? 1.0 : 0.0;
    }
  }
}

}  // extern "C"
