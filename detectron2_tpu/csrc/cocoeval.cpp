// Native evaluation kernels for detectron2_tpu.
//
// The TPU-native analogue of the reference's C++ COCOeval
// (detectron2/layers/csrc/cocoeval/cocoeval.cpp): host-side evaluation hot
// loops exposed through a plain C ABI (loaded via ctypes — no pybind11).
//
//  - d2t_evaluate_img: the greedy per-(image, category) detection<->gt
//    matching loop at every IoU threshold (the inner loop of COCOeval
//    evaluateImg).
//  - d2t_rle_iou: pairwise mask IoU directly in run-length space (no mask
//    decompression), the maskApi rleIou algorithm.
//  - d2t_rle_area: run-length areas.
//
// Build: g++ -O3 -shared -fPIC cocoeval.cpp -o libd2t_eval.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Greedy matching for one (image, category, maxDet) cell.
//
// Inputs:
//   T, D, G        : number of IoU thresholds / detections / ground truths
//   iou_thrs  [T]  : IoU thresholds
//   ious      [D*G]: pairwise IoU (detection-major), gt already sorted
//                    ignored-last
//   gt_ignore [G]  : 1 if the gt is ignored (crowd / area range)
//   iscrowd   [G]  : 1 if the gt is crowd
// Outputs:
//   dtm   [T*D]: matched gt index + 1, or 0 (unmatched)
//   gtm   [T*G]: matched dt index + 1, or 0
//   dt_ig [T*D]: 1 if the matched gt was ignored
void d2t_evaluate_img(
    int64_t T, int64_t D, int64_t G,
    const double* iou_thrs,
    const double* ious,
    const uint8_t* gt_ignore,
    const uint8_t* iscrowd,
    int64_t* dtm,
    int64_t* gtm,
    uint8_t* dt_ig) {
  for (int64_t t = 0; t < T; ++t) {
    const double thr = std::min(iou_thrs[t], 1.0 - 1e-10);
    int64_t* dtm_t = dtm + t * D;
    int64_t* gtm_t = gtm + t * G;
    uint8_t* dtig_t = dt_ig + t * D;
    for (int64_t d = 0; d < D; ++d) {
      double best = thr;
      int64_t m = -1;
      const double* iou_d = ious + d * G;
      for (int64_t g = 0; g < G; ++g) {
        // gt already matched (and not crowd) -> unavailable
        if (gtm_t[g] > 0 && !iscrowd[g]) continue;
        // best match so far is a real gt; remaining gts are ignored -> stop
        if (m > -1 && !gt_ignore[m] && gt_ignore[g]) break;
        if (iou_d[g] < best) continue;
        best = iou_d[g];
        m = g;
      }
      if (m == -1) continue;
      dtig_t[d] = gt_ignore[m];
      dtm_t[d] = m + 1;
      gtm_t[m] = d + 1;
    }
  }
}

// Run-length mask utilities. Counts arrays are the uncompressed column-major
// run lengths starting with the count of zeros (COCO convention).

// Total foreground area of a counts array.
int64_t d2t_rle_area(const uint32_t* counts, int64_t m) {
  int64_t a = 0;
  for (int64_t i = 1; i < m; i += 2) a += counts[i];
  return a;
}

// Intersection area of two RLEs (same total size), computed by merging runs.
static int64_t rle_intersection(
    const uint32_t* ca, int64_t ma, const uint32_t* cb, int64_t mb) {
  int64_t inter = 0;
  int64_t ia = 0, ib = 0;               // run indices
  int64_t ra = ia < ma ? ca[0] : 0;     // remaining length of current run
  int64_t rb = ib < mb ? cb[0] : 0;
  bool va = false, vb = false;          // current run values
  while (ia < ma && ib < mb) {
    // skip empty runs
    while (ia < ma && ra == 0) { ++ia; va = !va; if (ia < ma) ra = ca[ia]; }
    while (ib < mb && rb == 0) { ++ib; vb = !vb; if (ib < mb) rb = cb[ib]; }
    if (ia >= ma || ib >= mb) break;
    int64_t step = std::min(ra, rb);
    if (va && vb) inter += step;
    ra -= step;
    rb -= step;
  }
  return inter;
}

// Pairwise IoU of D detection RLEs against G gt RLEs.
//   counts data is passed as one flat uint32 buffer + offsets/lengths.
//   crowd gt use IoA (detection-area denominator).
void d2t_rle_iou(
    int64_t D, int64_t G,
    const uint32_t* dt_data, const int64_t* dt_off, const int64_t* dt_len,
    const uint32_t* gt_data, const int64_t* gt_off, const int64_t* gt_len,
    const uint8_t* iscrowd,
    double* out /* D*G */) {
  std::vector<int64_t> dt_area(D), gt_area(G);
  for (int64_t d = 0; d < D; ++d)
    dt_area[d] = d2t_rle_area(dt_data + dt_off[d], dt_len[d]);
  for (int64_t g = 0; g < G; ++g)
    gt_area[g] = d2t_rle_area(gt_data + gt_off[g], gt_len[g]);

  for (int64_t d = 0; d < D; ++d) {
    for (int64_t g = 0; g < G; ++g) {
      int64_t inter = rle_intersection(
          dt_data + dt_off[d], dt_len[d], gt_data + gt_off[g], gt_len[g]);
      double denom;
      if (iscrowd[g]) {
        denom = static_cast<double>(dt_area[d]);
      } else {
        denom = static_cast<double>(dt_area[d] + gt_area[g] - inter);
      }
      out[d * G + g] = denom > 0 ? inter / denom : 0.0;
    }
  }
}

}  // extern "C"
