// Native BPE trainer (replaces the sentencepiece trainer, reference
// utils/preprocessing.py:66-85). The pure-Python trainer in
// data/tokenizer.py is the executable specification; this reproduces it
// EXACTLY (same greedy highest-frequency merge with the same
// (count, pair-strings) lexicographic tie-break, same stop conditions) at
// corpus scale — the 40M-line LibriSpeech LM corpus is hours in Python.
//
// Algorithm: word-frequency table -> symbol sequences over code points ->
// repeat: pick max-count pair, merge in the words that contain it (tracked
// with a pair -> word-ids index; entries are verified at use, so stale ids
// are harmless).
//
// C API:
//   void* ecf_bpe_train(const char* corpus_path, int vocab_size, int lowercase)
//   long long ecf_bpe_result_size(void* h, int which)   // 0 pieces, 1 merges
//   void ecf_bpe_result(void* h, int which, char* out)
//   void ecf_bpe_train_free(void* h)
// Pieces are '\n'-joined (id order, starting at id 1 — id 0 is <unk>,
// added by the Python wrapper); merges are "a\tb" lines in rank order.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// Split a UTF-8 string into code-point units (as Python's list(str) does).
std::vector<std::string> utf8_split(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t n = 1;
    if ((c & 0x80) == 0) n = 1;
    else if ((c & 0xE0) == 0xC0) n = 2;
    else if ((c & 0xF0) == 0xE0) n = 3;
    else if ((c & 0xF8) == 0xF0) n = 4;
    if (i + n > s.size()) n = 1;
    out.emplace_back(s.substr(i, n));
    i += n;
  }
  return out;
}

struct Trainer {
  std::vector<std::string> pieces;              // symbol id -> string (no <unk>)
  std::vector<std::pair<int, int>> merges;      // (a, b) symbol ids
  std::string pieces_blob, merges_blob;
};

using Pair = uint64_t;
inline Pair mk(int a, int b) { return ((uint64_t)(uint32_t)a << 32) | (uint32_t)b; }

}  // namespace

extern "C" {

void* ecf_bpe_train(const char* corpus_path, int vocab_size, int lowercase) {
  FILE* f = std::fopen(corpus_path, "rb");
  if (!f) return nullptr;

  static const std::string kBoundary = "\xE2\x96\x81";  // U+2581

  // ---- word frequency table
  std::unordered_map<std::string, int64_t> word_freq;
  {
    std::string line;
    char buf[1 << 16];
    while (std::fgets(buf, sizeof(buf), f)) {
      line.assign(buf);
      if (lowercase)
        for (auto& ch : line)
          if (ch >= 'A' && ch <= 'Z') ch += 32;
      size_t i = 0;
      while (i < line.size()) {
        while (i < line.size() && std::isspace((unsigned char)line[i])) ++i;
        size_t j = i;
        while (j < line.size() && !std::isspace((unsigned char)line[j])) ++j;
        if (j > i) word_freq[kBoundary + line.substr(i, j - i)] += 1;
        i = j;
      }
    }
    std::fclose(f);
  }

  auto* tr = new Trainer();

  // ---- alphabet (sorted code points) and symbolised words
  std::unordered_map<std::string, int> sym_id;
  {
    std::unordered_set<std::string> chars;
    for (auto& kv : word_freq)
      for (auto& c : utf8_split(kv.first)) chars.insert(c);
    std::vector<std::string> alphabet(chars.begin(), chars.end());
    std::sort(alphabet.begin(), alphabet.end());
    for (auto& c : alphabet) {
      sym_id[c] = (int)tr->pieces.size();
      tr->pieces.push_back(c);
    }
  }

  std::vector<std::vector<int>> words;
  std::vector<int64_t> freqs;
  words.reserve(word_freq.size());
  // deterministic order: sort words (Python dict order is insertion order of
  // the Counter, which is corpus order — ordering only matters for merge
  // application, not for counts/tie-breaks, so any fixed order is fine)
  {
    std::vector<const std::string*> keys;
    keys.reserve(word_freq.size());
    for (auto& kv : word_freq) keys.push_back(&kv.first);
    std::sort(keys.begin(), keys.end(),
              [](const std::string* a, const std::string* b) { return *a < *b; });
    for (auto* k : keys) {
      std::vector<int> w;
      for (auto& c : utf8_split(*k)) w.push_back(sym_id[c]);
      words.push_back(std::move(w));
      freqs.push_back(word_freq[*k]);
    }
  }

  // ---- pair counts + pair -> word-ids index (entries may go stale; they
  // are re-verified when the pair is merged)
  std::unordered_map<Pair, int64_t> counts;
  std::unordered_map<Pair, std::vector<int>> where;
  for (size_t wi = 0; wi < words.size(); ++wi) {
    auto& w = words[wi];
    for (size_t i = 0; i + 1 < w.size(); ++i) {
      Pair p = mk(w[i], w[i + 1]);
      auto& c = counts[p];
      c += freqs[wi];
      auto& loc = where[p];
      if (loc.empty() || loc.back() != (int)wi) loc.push_back((int)wi);
    }
  }

  int target = vocab_size - 1;  // id 0 (<unk>) is added by the wrapper
  while ((int)tr->pieces.size() < target && !counts.empty()) {
    // max by (count, pair strings) — the Python trainer's tie-break
    Pair best = 0;
    int64_t best_n = -1;
    for (auto& kv : counts) {
      if (kv.second < best_n) continue;
      if (kv.second > best_n) {
        best = kv.first;
        best_n = kv.second;
        continue;
      }
      int a1 = (int)(kv.first >> 32), b1 = (int)(uint32_t)kv.first;
      int a2 = (int)(best >> 32), b2 = (int)(uint32_t)best;
      if (tr->pieces[a1] > tr->pieces[a2] ||
          (tr->pieces[a1] == tr->pieces[a2] && tr->pieces[b1] > tr->pieces[b2]))
        best = kv.first;
    }
    if (best_n < 2) break;
    int a = (int)(best >> 32), b = (int)(uint32_t)best;
    int nid = (int)tr->pieces.size();
    tr->pieces.push_back(tr->pieces[a] + tr->pieces[b]);
    tr->merges.emplace_back(a, b);

    auto loc_it = where.find(best);
    std::vector<int> locs;
    if (loc_it != where.end()) locs.swap(loc_it->second);
    for (int wi : locs) {
      auto& w = words[wi];
      if (w.size() < 2) continue;
      int64_t fq = freqs[wi];
      size_t i = 0, out = 0;
      bool changed = false;
      // in-place merge pass, updating neighbour pair counts like the spec
      std::vector<int>& v = w;
      std::vector<int> nw;
      nw.reserve(v.size());
      while (i < v.size()) {
        if (i + 1 < v.size() && v[i] == a && v[i + 1] == b) {
          if (!nw.empty()) {
            counts[mk(nw.back(), a)] -= fq;
            auto& c2 = counts[mk(nw.back(), nid)];
            c2 += fq;
            auto& l2 = where[mk(nw.back(), nid)];
            if (l2.empty() || l2.back() != wi) l2.push_back(wi);
          }
          if (i + 2 < v.size()) {
            counts[mk(b, v[i + 2])] -= fq;
            auto& c3 = counts[mk(nid, v[i + 2])];
            c3 += fq;
            auto& l3 = where[mk(nid, v[i + 2])];
            if (l3.empty() || l3.back() != wi) l3.push_back(wi);
          }
          nw.push_back(nid);
          i += 2;
          changed = true;
        } else {
          nw.push_back(v[i]);
          ++i;
        }
      }
      (void)out;
      if (changed) v.swap(nw);
    }
    counts.erase(best);
    where.erase(best);
    // drop non-positive counts (the spec's `+pair_counts`)
    for (auto it = counts.begin(); it != counts.end();) {
      if (it->second <= 0) it = counts.erase(it);
      else ++it;
    }
  }

  // ---- serialize
  for (auto& p : tr->pieces) {
    tr->pieces_blob += p;
    tr->pieces_blob += '\n';
  }
  for (auto& m : tr->merges) {
    tr->merges_blob += tr->pieces[m.first];
    tr->merges_blob += '\t';
    tr->merges_blob += tr->pieces[m.second];
    tr->merges_blob += '\n';
  }
  return tr;
}

long long ecf_bpe_result_size(void* h, int which) {
  auto* tr = (Trainer*)h;
  return (long long)(which == 0 ? tr->pieces_blob.size() : tr->merges_blob.size());
}

void ecf_bpe_result(void* h, int which, char* out) {
  auto* tr = (Trainer*)h;
  const std::string& s = which == 0 ? tr->pieces_blob : tr->merges_blob;
  std::memcpy(out, s.data(), s.size());
}

void ecf_bpe_train_free(void* h) { delete (Trainer*)h; }

}  // extern "C"
