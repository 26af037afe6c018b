// Native matching-track metric core.
//
// The reference computes segment AP in pure Python — per-prediction
// incremental interval algebra over Python lists (reference:
// vsc/metrics.py:238-378), which dominates evaluation time for large
// prediction sets. This is the same algorithm in C++ behind a C ABI
// (loaded via ctypes; no pybind11 dependency): identical semantics,
// including the overlap-gated GT subsetting (VCSL fig-4f fix), the
// score-tie grouping, and the geometric-mean precision/recall.
//
// Inputs are flat arrays prepared by the Python wrapper
// (vsc2022_tpu/metrics.py): predictions sorted by descending score,
// pair ids densified to [0, n_pairs).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Box {
  double qs, qe, rs, re;
};

// Union length of a set of 1-D intervals (touching intervals merge,
// matching the reference sweep; vsc/metrics.py:154-169).
double union_length(std::vector<std::pair<double, double>>& iv) {
  if (iv.empty()) return 0.0;
  std::sort(iv.begin(), iv.end());
  double total = 0.0;
  double cur_start = iv[0].first, cur_end = iv[0].second;
  for (size_t i = 1; i < iv.size(); ++i) {
    if (iv[i].first <= cur_end) {
      cur_end = std::max(cur_end, iv[i].second);
    } else {
      total += cur_end - cur_start;
      cur_start = iv[i].first;
      cur_end = iv[i].second;
    }
  }
  total += cur_end - cur_start;
  return total;
}

// |A ∩ B| = |A| + |B| − |A ∪ B| on interval sets.
double intersect_length(const std::vector<std::pair<double, double>>& a,
                        const std::vector<std::pair<double, double>>& b) {
  std::vector<std::pair<double, double>> au(a), bu(b), un(a);
  un.insert(un.end(), b.begin(), b.end());
  return union_length(au) + union_length(bu) - union_length(un);
}

bool overlaps(const Box& a, const Box& b) {
  double dq = std::min(a.qe, b.qe) - std::max(a.qs, b.qs);
  double dr = std::min(a.re, b.re) - std::max(a.rs, b.rs);
  return dq > 0.0 && dr > 0.0 && dq * dr > 0.0;
}

struct PairState {
  std::vector<Box> gts;
  std::vector<Box> preds;
  double inter_q = 0.0, inter_r = 0.0;
  double tot_q = 0.0, tot_r = 0.0;
};

}  // namespace

extern "C" {

// Returns 0 on success, 1 on division-by-zero (zero total prediction
// length in a score group — the Python reference raises here).
// out_points must have room for n_pred entries per array.
int vsc_match_metric(
    int64_t n_gt, const int64_t* gt_pair, const double* gt_boxes,
    int64_t n_pred, const int64_t* pred_pair, const double* pred_boxes,
    const double* pred_scores, int64_t n_pairs, double* out_metric,
    double* out_recalls, double* out_precisions, double* out_scores,
    int64_t* out_n_points) {
  std::vector<PairState> pairs(static_cast<size_t>(n_pairs));
  for (int64_t i = 0; i < n_gt; ++i) {
    pairs[gt_pair[i]].gts.push_back(Box{gt_boxes[4 * i], gt_boxes[4 * i + 1],
                                        gt_boxes[4 * i + 2],
                                        gt_boxes[4 * i + 3]});
  }

  // Total GT length per axis: sum over pairs of per-pair merged unions.
  double gt_total_q = 0.0, gt_total_r = 0.0;
  for (auto& p : pairs) {
    std::vector<std::pair<double, double>> q_iv, r_iv;
    for (auto& g : p.gts) {
      q_iv.emplace_back(g.qs, g.qe);
      r_iv.emplace_back(g.rs, g.re);
    }
    gt_total_q += union_length(q_iv);
    gt_total_r += union_length(r_iv);
  }

  double recall = 0.0, metric = 0.0;
  double inter_q = 0.0, inter_r = 0.0, tot_q = 0.0, tot_r = 0.0;
  int64_t n_points = 0;

  int64_t i = 0;
  while (i < n_pred) {
    double group_score = pred_scores[i];
    // Apply the whole tie group before computing P/R.
    while (i < n_pred && pred_scores[i] == group_score) {
      PairState& st = pairs[pred_pair[i]];
      Box pred{pred_boxes[4 * i], pred_boxes[4 * i + 1], pred_boxes[4 * i + 2],
               pred_boxes[4 * i + 3]};
      st.preds.push_back(pred);

      // GTs overlapping at least one prediction count toward the
      // intersection (not toward total GT length).
      std::vector<std::pair<double, double>> gt_q, gt_r;
      for (auto& g : st.gts) {
        bool hit = false;
        for (auto& pr : st.preds) {
          if (overlaps(g, pr)) {
            hit = true;
            break;
          }
        }
        if (hit) {
          gt_q.emplace_back(g.qs, g.qe);
          gt_r.emplace_back(g.rs, g.re);
        }
      }
      std::vector<std::pair<double, double>> pr_q, pr_r;
      for (auto& pr : st.preds) {
        pr_q.emplace_back(pr.qs, pr.qe);
        pr_r.emplace_back(pr.rs, pr.re);
      }
      double new_inter_q = intersect_length(pr_q, gt_q);
      double new_inter_r = intersect_length(pr_r, gt_r);
      double new_tot_q = union_length(pr_q);
      double new_tot_r = union_length(pr_r);

      inter_q += new_inter_q - st.inter_q;
      inter_r += new_inter_r - st.inter_r;
      tot_q += new_tot_q - st.tot_q;
      tot_r += new_tot_r - st.tot_r;
      st.inter_q = new_inter_q;
      st.inter_r = new_inter_r;
      st.tot_q = new_tot_q;
      st.tot_r = new_tot_r;
      ++i;
    }

    if (gt_total_q == 0.0 || gt_total_r == 0.0 || tot_q == 0.0 ||
        tot_r == 0.0) {
      return 1;  // mirror Python's ZeroDivisionError
    }
    double recall_q = inter_q / gt_total_q;
    double recall_r = inter_r / gt_total_r;
    double prec_q = inter_q / tot_q;
    double prec_r = inter_r / tot_r;
    double new_recall = std::sqrt(recall_q * recall_r);
    double precision = std::sqrt(prec_q * prec_r);
    double delta_recall = new_recall - recall;
    metric += precision * delta_recall;
    recall = new_recall;
    if (delta_recall > 0.0) {
      out_recalls[n_points] = recall;
      out_precisions[n_points] = precision;
      out_scores[n_points] = group_score;
      ++n_points;
    }
  }

  *out_metric = metric;
  *out_n_points = n_points;
  return 0;
}

}  // extern "C"
