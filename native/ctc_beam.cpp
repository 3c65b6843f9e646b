// Native CTC prefix beam search with ARPA n-gram fusion.
//
// C++ counterpart of decoding/ctc_beam.py + decoding/ngram.py — the native
// parity piece for the reference's ctcdecode/kenlm C++ extensions
// (reference model_ctc.py:138-181, SURVEY.md §2.3). Exposed through a plain
// C API loaded with ctypes (decoding/native_binding.py). The Python
// implementation is the executable specification; tests assert equivalence.
//
// Build: make -C native   (-> libecf_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kLog0 = -1e30;
constexpr double kLog10Unk = -10.0;

double logaddexp(double a, double b) {
  if (a < b) std::swap(a, b);
  if (b <= kLog0 / 2) return a;
  return a + std::log1p(std::exp(b - a));
}

// ---------------------------------------------------------------------------
// ARPA n-gram model
// ---------------------------------------------------------------------------

struct Arpa {
  // n-gram key (words joined by ' ') -> (log10 prob, backoff)
  std::unordered_map<std::string, std::pair<double, double>> table;
  int order = 0;
  int offset = 100;  // token id -> unicode char code offset

  static std::string utf8(uint32_t cp) {
    std::string out;
    if (cp < 0x80) {
      out += static_cast<char>(cp);
    } else if (cp < 0x800) {
      out += static_cast<char>(0xC0 | (cp >> 6));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
      out += static_cast<char>(0xE0 | (cp >> 12));
      out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    } else {
      out += static_cast<char>(0xF0 | (cp >> 18));
      out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
      out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
      out += static_cast<char>(0x80 | (cp & 0x3F));
    }
    return out;
  }

  bool load(const char* path) {
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    int section = -1;
    while (std::getline(f, line)) {
      if (!line.empty() && line.back() == '\r') line.pop_back();
      if (line.empty() || line.rfind("ngram ", 0) == 0) continue;
      if (line[0] == '\\') {
        if (line == "\\data\\" || line == "\\end\\") {
          section = -1;
        } else {
          auto dash = line.find("-grams:");
          if (dash != std::string::npos) {
            section = std::atoi(line.substr(1, dash - 1).c_str());
            order = std::max(order, section);
          }
        }
        continue;
      }
      if (section < 0) continue;
      // logp \t words [\t backoff]
      auto t1 = line.find('\t');
      if (t1 == std::string::npos) continue;
      auto t2 = line.find('\t', t1 + 1);
      double logp = std::atof(line.substr(0, t1).c_str());
      std::string words = (t2 == std::string::npos)
                              ? line.substr(t1 + 1)
                              : line.substr(t1 + 1, t2 - t1 - 1);
      double backoff =
          (t2 == std::string::npos) ? 0.0 : std::atof(line.substr(t2 + 1).c_str());
      table[words] = {logp, backoff};
    }
    return true;
  }

  // State: words of the trailing context (each a single LM "word").
  using State = std::vector<std::string>;

  State start_state() const {
    if (table.count("<s>")) return {"<s>"};
    return {};
  }

  static std::string join(const State& ctx, size_t start, const std::string* extra) {
    std::string key;
    for (size_t i = start; i < ctx.size(); ++i) {
      if (!key.empty()) key += ' ';
      key += ctx[i];
    }
    if (extra) {
      if (!key.empty()) key += ' ';
      key += *extra;
    }
    return key;
  }

  double score_word(const State& state, const std::string& word,
                    State* next_state) const {
    double backoff_sum = 0.0;
    double logp = kLog10Unk;
    bool found = false;
    for (size_t start = 0; start <= state.size(); ++start) {
      auto it = table.find(join(state, start, &word));
      if (it != table.end()) {
        logp = it->second.first;
        found = true;
        break;
      }
      auto ctx = table.find(join(state, start, nullptr));
      if (ctx != table.end()) backoff_sum += ctx->second.second;
    }
    if (!found) {
      auto uni = table.find(word);
      if (uni != table.end()) logp = uni->second.first;
      backoff_sum = found ? backoff_sum : backoff_sum;  // keep accumulated backoff
    }
    State ns(state);
    ns.push_back(word);
    if (order > 1) {
      while (static_cast<int>(ns.size()) > order - 1) ns.erase(ns.begin());
    } else {
      ns.clear();
    }
    while (!ns.empty() && !table.count(join(ns, 0, nullptr))) ns.erase(ns.begin());
    *next_state = std::move(ns);
    return logp + backoff_sum;
  }

  double score_token(const State& state, int token_id, State* next_state) const {
    return score_word(state, utf8(static_cast<uint32_t>(token_id + offset)),
                      next_state);
  }
};

// ---------------------------------------------------------------------------
// Prefix beam search
// ---------------------------------------------------------------------------

struct Beam {
  std::vector<int> prefix;
  double p_blank = kLog0;
  double p_nonblank = kLog0;
  Arpa::State lm_state;
  double lm_score = 0.0;

  double total() const { return logaddexp(p_blank, p_nonblank) + lm_score; }
};

struct PrefixKey {
  size_t operator()(const std::vector<int>& v) const {
    size_t h = 1469598103934665603ull;
    for (int x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

int beam_search(const float* log_probs, int t_max, int v, int seq_len,
                int beam_size, int blank, const Arpa* lm, double alpha,
                double beta, int cutoff_top_n, int* out_tokens, int max_out) {
  if (cutoff_top_n <= 0 || cutoff_top_n > v) cutoff_top_n = v;
  std::vector<int> cand(v);
  std::unordered_map<std::vector<int>, Beam, PrefixKey> beams;
  {
    Beam b;
    b.prefix = {};
    b.p_blank = 0.0;
    if (lm) b.lm_state = lm->start_state();
    beams[{}] = b;
  }

  for (int t = 0; t < seq_len && t < t_max; ++t) {
    const float* lp = log_probs + static_cast<size_t>(t) * v;

    // per-frame candidate pruning (ctcdecode's cutoff_top_n); the blank is
    // always a candidate so prefixes can terminate
    int n_cand = cutoff_top_n;
    for (int c = 0; c < v; ++c) cand[c] = c;
    if (cutoff_top_n < v) {
      std::partial_sort(cand.begin(), cand.begin() + cutoff_top_n, cand.end(),
                        [lp](int a, int b) { return lp[a] > lp[b]; });
      bool has_blank = false;
      for (int i = 0; i < cutoff_top_n; ++i) has_blank |= (cand[i] == blank);
      if (!has_blank) cand[cutoff_top_n - 1] = blank;
    }

    std::unordered_map<std::vector<int>, Beam, PrefixKey> next;

    auto entry = [&next](const std::vector<int>& prefix) -> Beam& {
      auto it = next.find(prefix);
      if (it == next.end()) {
        Beam b;
        b.prefix = prefix;
        it = next.emplace(prefix, std::move(b)).first;
      }
      return it->second;
    };

    for (const auto& kv : beams) {
      const Beam& b = kv.second;
      double p_tot = logaddexp(b.p_blank, b.p_nonblank);
      for (int ci = 0; ci < n_cand; ++ci) {
        int c = cand[ci];
        double p = lp[c];
        if (c == blank) {
          Beam& e = entry(b.prefix);
          e.p_blank = logaddexp(e.p_blank, p_tot + p);
          e.lm_state = b.lm_state;
          e.lm_score = b.lm_score;
          continue;
        }
        bool is_repeat = !b.prefix.empty() && b.prefix.back() == c;
        if (is_repeat) {
          Beam& e = entry(b.prefix);
          e.p_nonblank = logaddexp(e.p_nonblank, b.p_nonblank + p);
          e.lm_state = b.lm_state;
          e.lm_score = b.lm_score;
          std::vector<int> np(b.prefix);
          np.push_back(c);
          Arpa::State ns = b.lm_state;
          double nsc = b.lm_score;
          if (lm && alpha != 0.0) {
            Arpa::State out_state;
            double w_lp = lm->score_token(b.lm_state, c, &out_state);
            nsc += alpha * w_lp + beta;
            ns = std::move(out_state);
          }
          Beam& e2 = entry(np);
          e2.p_nonblank = logaddexp(e2.p_nonblank, b.p_blank + p);
          e2.lm_state = std::move(ns);
          e2.lm_score = nsc;
        } else {
          std::vector<int> np(b.prefix);
          np.push_back(c);
          Arpa::State ns = b.lm_state;
          double nsc = b.lm_score;
          if (lm && alpha != 0.0) {
            Arpa::State out_state;
            double w_lp = lm->score_token(b.lm_state, c, &out_state);
            nsc += alpha * w_lp + beta;
            ns = std::move(out_state);
          }
          Beam& e = entry(np);
          e.p_nonblank = logaddexp(e.p_nonblank, p_tot + p);
          e.lm_state = std::move(ns);
          e.lm_score = nsc;
        }
      }
    }

    std::vector<Beam*> order;
    order.reserve(next.size());
    for (auto& kv : next) order.push_back(&kv.second);
    std::sort(order.begin(), order.end(),
              [](const Beam* a, const Beam* b) { return a->total() > b->total(); });
    if (static_cast<int>(order.size()) > beam_size) order.resize(beam_size);
    std::unordered_map<std::vector<int>, Beam, PrefixKey> pruned;
    for (Beam* b : order) pruned.emplace(b->prefix, std::move(*b));
    beams = std::move(pruned);
  }

  const Beam* best = nullptr;
  for (const auto& kv : beams) {
    if (!best || kv.second.total() > best->total()) best = &kv.second;
  }
  if (!best) return 0;
  int n = std::min<int>(best->prefix.size(), max_out);
  std::copy(best->prefix.begin(), best->prefix.begin() + n, out_tokens);
  return n;
}

}  // namespace

extern "C" {

void* ecf_arpa_load(const char* path, int ngram_offset) {
  auto* a = new Arpa();
  a->offset = ngram_offset;
  if (!a->load(path)) {
    delete a;
    return nullptr;
  }
  return a;
}

void ecf_arpa_free(void* lm) { delete static_cast<Arpa*>(lm); }

int ecf_arpa_order(void* lm) { return static_cast<Arpa*>(lm)->order; }

int ecf_ctc_beam_search(const float* log_probs, int t_max, int v, int seq_len,
                        int beam_size, int blank, void* lm, double alpha,
                        double beta, int cutoff_top_n, int* out_tokens,
                        int max_out) {
  return beam_search(log_probs, t_max, v, seq_len, beam_size, blank,
                     static_cast<const Arpa*>(lm), alpha, beta, cutoff_top_n,
                     out_tokens, max_out);
}

}  // extern "C"
