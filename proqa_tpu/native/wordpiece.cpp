// Native wordpiece tokenizer — host-side hot path for corpus encoding.
//
// The reference tokenizes millions of paragraphs in Python through
// transformers.BertTokenizer inside Dataset.__getitem__
// (/root/reference/retrieval/datasets.py:96-101); at TPU encode throughput the
// host tokenizer becomes the bottleneck. This implements the ASCII fast path
// of BERT basic+wordpiece tokenization (clean -> whitespace split -> lower ->
// punct split -> greedy longest-match wordpiece) with exact parity to
// proqa_tpu/text/{basic,wordpiece}.py; non-ASCII strings are routed to the
// Python implementation by the binding layer.
//
// C ABI (ctypes): see proqa_tpu/native/wordpiece.py.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  int32_t unk_id = 0;
  bool lower = true;
  size_t max_chars_per_word = 100;
};

inline bool is_ascii_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool is_ascii_control(unsigned char c) {
  // \t \n \r are whitespace, not control, per BERT rules
  return (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f;
}

inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) || (c >= 91 && c <= 96) ||
         (c >= 123 && c <= 126);
}

// Greedy longest-match-first wordpiece of one word; appends ids.
void wordpiece(const Tokenizer& t, const std::string& word,
               std::vector<int32_t>* out) {
  if (word.size() > t.max_chars_per_word) {
    out->push_back(t.unk_id);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  std::string buf;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t piece = -1;
    while (start < end) {
      buf.assign(start > 0 ? "##" : "");
      buf.append(word, start, end - start);
      auto it = t.vocab.find(buf);
      if (it != t.vocab.end()) {
        piece = it->second;
        break;
      }
      --end;
    }
    if (piece < 0) {
      out->push_back(t.unk_id);
      return;
    }
    pieces.push_back(piece);
    start = end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// vocab_blob: newline-joined tokens, index = id.
void* wp_create(const char* vocab_blob, int do_lower_case) {
  auto* t = new Tokenizer();
  t->lower = do_lower_case != 0;
  const char* p = vocab_blob;
  int32_t id = 0;
  while (*p) {
    const char* nl = strchr(p, '\n');
    size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
    if (len > 0) {
      t->vocab.emplace(std::string(p, len), id);
    }
    ++id;
    if (!nl) break;
    p = nl + 1;
  }
  auto unk = t->vocab.find("[UNK]");
  t->unk_id = unk == t->vocab.end() ? 0 : unk->second;
  return t;
}

void wp_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Tokenize ASCII text into wordpiece ids. Returns the token count (may
// exceed max_out; only min(n, max_out) ids are written). Returns -1 if the
// text contains non-ASCII bytes (caller must use the Python path).
int32_t wp_tokenize(void* handle, const char* text, int32_t* out,
                    int32_t max_out) {
  const Tokenizer& t = *static_cast<Tokenizer*>(handle);
  std::vector<int32_t> ids;
  std::string word;
  auto flush_word = [&]() {
    if (!word.empty()) {
      wordpiece(t, word, &ids);
      word.clear();
    }
  };
  for (const unsigned char* p = reinterpret_cast<const unsigned char*>(text);
       *p; ++p) {
    unsigned char c = *p;
    if (c >= 0x80) return -1;  // non-ASCII: python fallback
    if (c == 0 || is_ascii_control(c)) continue;
    if (is_ascii_ws(c)) {
      flush_word();
      continue;
    }
    if (is_ascii_punct(c)) {
      flush_word();
      word.push_back(static_cast<char>(c));
      flush_word();
      continue;
    }
    word.push_back(t.lower ? static_cast<char>(tolower(c))
                           : static_cast<char>(c));
  }
  flush_word();
  int32_t n = static_cast<int32_t>(ids.size());
  int32_t w = n < max_out ? n : max_out;
  if (w > 0) memcpy(out, ids.data(), sizeof(int32_t) * w);
  return n;
}

}  // extern "C"
