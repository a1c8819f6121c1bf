// C++ CLIP BPE tokenizer — the native text-preprocessing path.
//
// Mirrors ccedit_tpu/conditioning/tokenizer.py (byte-level BPE with the
// CLIP </w> end-of-word convention, lowercasing, whitespace collapse,
// BOS=49406/EOS=49407, EOS padding).  Loaded via ctypes
// (ccedit_tpu/conditioning/native_tokenizer.py); the Python implementation
// remains as reference/fallback and the two are cross-checked in tests.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kBos = 49406;
constexpr int32_t kEos = 49407;

// GPT-2/CLIP bytes->unicode table (mirrors tokenizer.py bytes_to_unicode).
std::vector<std::string> ByteEncoder() {
  std::vector<int> bs;
  for (int b = int('!'); b <= int('~'); ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs(bs.begin(), bs.end());
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (std::find(bs.begin(), bs.end(), b) == bs.end()) {
      bs.push_back(b);
      cs.push_back(256 + n);
      ++n;
    }
  }
  std::vector<std::string> table(256);
  auto utf8 = [](int cp) {
    std::string out;
    if (cp < 0x80) {
      out += char(cp);
    } else if (cp < 0x800) {
      out += char(0xC0 | (cp >> 6));
      out += char(0x80 | (cp & 0x3F));
    } else {
      out += char(0xE0 | (cp >> 12));
      out += char(0x80 | ((cp >> 6) & 0x3F));
      out += char(0x80 | (cp & 0x3F));
    }
    return out;
  };
  for (size_t i = 0; i < bs.size(); ++i) table[bs[i]] = utf8(cs[i]);
  return table;
}

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 31 ^ std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash> ranks;
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  std::vector<std::string> byte_enc = ByteEncoder();
};

// Minimal JSON parser for {"string": int, ...} (the vocab.json schema).
bool ParseVocab(const std::string& path,
                std::unordered_map<std::string, int32_t>* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::stringstream ss;
  ss << f.rdbuf();
  const std::string s = ss.str();
  size_t i = 0;
  auto skip_ws = [&] { while (i < s.size() && isspace((unsigned char)s[i])) ++i; };
  skip_ws();
  if (i >= s.size() || s[i] != '{') return false;
  ++i;
  while (true) {
    skip_ws();
    if (i < s.size() && s[i] == '}') break;
    if (i >= s.size() || s[i] != '"') return false;
    ++i;
    std::string key;
    while (i < s.size() && s[i] != '"') {
      if (s[i] == '\\' && i + 1 < s.size()) {
        ++i;
        char c = s[i];
        if (c == 'n') key += '\n';
        else if (c == 't') key += '\t';
        else if (c == 'u' && i + 4 < s.size()) {
          int cp = std::stoi(s.substr(i + 1, 4), nullptr, 16);
          // encode cp as utf-8
          if (cp < 0x80) key += char(cp);
          else if (cp < 0x800) {
            key += char(0xC0 | (cp >> 6));
            key += char(0x80 | (cp & 0x3F));
          } else {
            key += char(0xE0 | (cp >> 12));
            key += char(0x80 | ((cp >> 6) & 0x3F));
            key += char(0x80 | (cp & 0x3F));
          }
          i += 4;
        } else key += c;
      } else {
        key += s[i];
      }
      ++i;
    }
    ++i;  // closing quote
    skip_ws();
    if (i >= s.size() || s[i] != ':') return false;
    ++i;
    skip_ws();
    size_t j = i;
    while (j < s.size() && (isdigit((unsigned char)s[j]) || s[j] == '-')) ++j;
    (*out)[key] = std::stoi(s.substr(i, j - i));
    i = j;
    skip_ws();
    if (i < s.size() && s[i] == ',') { ++i; continue; }
    if (i < s.size() && s[i] == '}') break;
  }
  return true;
}

std::vector<int32_t> Bpe(Tokenizer* t, const std::string& token) {
  auto it = t->cache.find(token);
  if (it != t->cache.end()) return it->second;

  // split into utf-8 "characters" (the byte-encoder emits 1-3 byte cps)
  std::vector<std::string> word;
  for (size_t i = 0; i < token.size();) {
    unsigned char c = token[i];
    size_t len = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : 3;
    word.push_back(token.substr(i, len));
    i += len;
  }
  if (word.empty()) return {};
  word.back() += "</w>";

  while (word.size() > 1) {
    int32_t best = std::numeric_limits<int32_t>::max();
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto r = t->ranks.find({word[i], word[i + 1]});
      if (r != t->ranks.end() && r->second < best) {
        best = r->second;
        best_i = i;
      }
    }
    if (best == std::numeric_limits<int32_t>::max()) break;
    // merge ALL occurrences of this bigram left-to-right
    const std::string a = word[best_i], b = word[best_i + 1];
    std::vector<std::string> merged;
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
        merged.push_back(a + b);
        i += 2;
      } else {
        merged.push_back(word[i]);
        ++i;
      }
    }
    word.swap(merged);
  }

  std::vector<int32_t> ids;
  for (const auto& piece : word) {
    auto v = t->vocab.find(piece);
    if (v != t->vocab.end()) ids.push_back(v->second);
  }
  t->cache[token] = ids;
  return ids;
}

// CLIP word pattern without std::regex (faster, no locale surprises):
// 's|'t|'re|'ve|'m|'ll|'d | [a-z]+ | [0-9] | other-non-space runs
std::vector<std::string> Split(const std::string& text) {
  std::vector<std::string> out;
  size_t i = 0;
  auto alpha = [](char c) { return isalpha((unsigned char)c); };
  auto digit = [](char c) { return isdigit((unsigned char)c); };
  auto space = [](char c) { return isspace((unsigned char)c); };
  while (i < text.size()) {
    if (space(text[i])) { ++i; continue; }
    if (text[i] == '\'') {
      static const char* kSuffixes[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
      bool matched = false;
      for (const char* suf : kSuffixes) {
        size_t n = strlen(suf);
        if (text.compare(i, n, suf) == 0) {
          out.emplace_back(text.substr(i, n));
          i += n;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    if (alpha(text[i])) {
      size_t j = i;
      while (j < text.size() && alpha(text[j])) ++j;
      out.emplace_back(text.substr(i, j - i));
      i = j;
    } else if (digit(text[i])) {
      out.emplace_back(1, text[i]);
      ++i;
    } else {
      size_t j = i;
      while (j < text.size() && !space(text[j]) && !alpha(text[j]) &&
             !digit(text[j])) ++j;
      out.emplace_back(text.substr(i, j - i));
      i = j;
    }
  }
  return out;
}

std::string Clean(const std::string& text) {
  std::string out;
  bool in_space = false;
  for (char c : text) {
    if (isspace((unsigned char)c)) {
      in_space = true;
      continue;
    }
    if (in_space && !out.empty()) out += ' ';
    in_space = false;
    out += char(tolower((unsigned char)c));
  }
  return out;
}

}  // namespace

extern "C" {

void* clip_tokenizer_create(const char* vocab_path, const char* merges_path) {
  auto t = std::make_unique<Tokenizer>();
  if (!ParseVocab(vocab_path, &t->vocab)) return nullptr;
  std::ifstream mf(merges_path);
  if (!mf) return nullptr;
  std::string line;
  int32_t rank = 0;
  bool first = true;
  while (std::getline(mf, line)) {
    if (first && line.rfind("#", 0) == 0) { first = false; continue; }
    first = false;
    auto sp = line.find(' ');
    if (sp == std::string::npos) continue;
    std::string a = line.substr(0, sp), b = line.substr(sp + 1);
    if (!b.empty() && b.back() == '\r') b.pop_back();
    if (a.empty() || b.empty()) continue;
    t->ranks[{a, b}] = rank++;
  }
  return t.release();
}

void clip_tokenizer_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

// Encodes `text` into out_ids (length max_len): BOS + ids + EOS, EOS-padded.
// Returns the number of non-padding ids written (incl. BOS/EOS).
int32_t clip_tokenizer_encode(void* handle, const char* text, int32_t max_len,
                              int32_t* out_ids) {
  auto* t = static_cast<Tokenizer*>(handle);
  std::fill(out_ids, out_ids + max_len, kEos);
  out_ids[0] = kBos;
  int32_t pos = 1;
  for (const auto& w : Split(Clean(text))) {
    std::string mapped;
    for (unsigned char c : w) mapped += t->byte_enc[c];
    for (int32_t id : Bpe(t, mapped)) {
      if (pos >= max_len - 1) break;
      out_ids[pos++] = id;
    }
    if (pos >= max_len - 1) break;
  }
  out_ids[pos++] = kEos;
  return pos;
}

}  // extern "C"
