// Native BPE encoder.
//
// Fast path for data/tokenizer.py's encode (the pure-Python merge loop is the
// executable specification; equivalence is tested). Matters for on-the-fly
// tokenization of the 40M-line LM corpus (reference utils/datasets.py:64-82,
// which leans on the sentencepiece C++ runtime for the same reason).
//
// The model (pieces + merges) is passed in from Python via the C API — no
// JSON parsing here. Word-level encode results are memoised.

#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bpe {
  std::unordered_map<std::string, int> piece_to_id;
  // merge pair "a\x01b" -> rank
  std::unordered_map<std::string, int> merge_rank;
  std::unordered_map<std::string, std::vector<int>> cache;
  std::mutex cache_mu;

  static std::string pair_key(const std::string& a, const std::string& b) {
    std::string k(a);
    k += '\x01';
    k += b;
    return k;
  }

  std::vector<int> encode_word(const std::string& word) {
    {
      std::lock_guard<std::mutex> lock(cache_mu);
      auto it = cache.find(word);
      if (it != cache.end()) return it->second;
    }
    // split into UTF-8 characters
    std::vector<std::string> symbols;
    for (size_t i = 0; i < word.size();) {
      unsigned char c = word[i];
      size_t n = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
      symbols.push_back(word.substr(i, n));
      i += n;
    }
    while (symbols.size() > 1) {
      int best_rank = -1;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < symbols.size(); ++i) {
        auto it = merge_rank.find(pair_key(symbols[i], symbols[i + 1]));
        if (it != merge_rank.end() &&
            (best_rank < 0 || it->second < best_rank)) {
          best_rank = it->second;
          best_i = i;
        }
      }
      if (best_rank < 0) break;
      symbols[best_i] += symbols[best_i + 1];
      symbols.erase(symbols.begin() + best_i + 1);
    }
    std::vector<int> ids;
    ids.reserve(symbols.size());
    for (const auto& s : symbols) {
      auto it = piece_to_id.find(s);
      ids.push_back(it == piece_to_id.end() ? 0 : it->second);
    }
    {
      std::lock_guard<std::mutex> lock(cache_mu);
      if (cache.size() < 1000000) cache.emplace(word, ids);
    }
    return ids;
  }
};

}  // namespace

extern "C" {

void* ecf_bpe_create(const char** pieces, int n_pieces, const char** merge_a,
                     const char** merge_b, int n_merges) {
  auto* t = new Bpe();
  for (int i = 0; i < n_pieces; ++i) t->piece_to_id.emplace(pieces[i], i);
  for (int i = 0; i < n_merges; ++i)
    t->merge_rank.emplace(Bpe::pair_key(merge_a[i], merge_b[i]), i);
  return t;
}

void ecf_bpe_free(void* tok) { delete static_cast<Bpe*>(tok); }

// Encode whitespace-split text; each word is prefixed with U+2581. Returns the
// number of ids written (clipped to max_out).
int ecf_bpe_encode(void* tok, const char* text, int* out_ids, int max_out) {
  auto* t = static_cast<Bpe*>(tok);
  static const std::string kBoundary = "\xE2\x96\x81";  // U+2581
  int n = 0;
  const char* p = text;
  while (*p) {
    while (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r') ++p;
    if (!*p) break;
    const char* start = p;
    while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
    std::string word = kBoundary + std::string(start, p - start);
    for (int id : t->encode_word(word)) {
      if (n >= max_out) return n;
      out_ids[n++] = id;
    }
  }
  return n;
}

}  // extern "C"
