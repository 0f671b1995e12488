// Native decoder for pixelSplat-format ".torch" chunk files.
//
// The RE10K dataset ships as torch.save archives (reference
// src/dataset/dataset_re10k.py:96): a STORE'd zip containing
// "<stem>/data.pkl" (a protocol-2/4 pickle of a list of scene dicts) and
// "<stem>/data/<key>" raw storage payloads. This decoder implements the
// two formats directly — a zip central-directory reader and a pickle
// virtual machine covering the opcode subset torch.save emits — so the
// input pipeline needs no host torch at all (mvldm_tpu/data/chunk_reader.py
// falls back to torch.load only when this library is unavailable).
//
// C ABI (consumed via ctypes from mvldm_tpu/data/native_chunk.py):
//   mvldm_chunk_open(path, err, errlen) -> handle | NULL
//   mvldm_chunk_num_scenes(h)
//   mvldm_scene_key(h, i)
//   mvldm_scene_cameras(h, i, &rows, &cols) -> float* (row-major)
//   mvldm_scene_num_images(h, i)
//   mvldm_scene_image(h, i, j, &nbytes) -> uint8* (JPEG bytes)
//   mvldm_chunk_free(h)
//
// Build: make -C native  (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- utilities

struct Error : std::runtime_error {
  explicit Error(const std::string& m) : std::runtime_error(m) {}
};

uint16_t rd16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint64_t rd64(const uint8_t* p) {
  return (uint64_t)rd32(p) | ((uint64_t)rd32(p + 4) << 32);
}

// ------------------------------------------------------------------ zip read

struct ZipEntry {
  std::string name;
  const uint8_t* data;
  uint64_t size;
};

// Parse a STORE'd zip (the only method torch.save uses) via the central
// directory; handles the zip64 end-of-central-directory variant.
std::vector<ZipEntry> parse_zip(const std::vector<uint8_t>& buf) {
  const uint8_t* b = buf.data();
  const size_t n = buf.size();
  if (n < 22) throw Error("file too small for a zip archive");

  // Find EOCD (scan back over a possible comment).
  size_t eocd = SIZE_MAX;
  const size_t scan_limit = n >= 22 + 65535 ? n - 22 - 65535 : 0;
  for (size_t i = n - 22; ; --i) {
    if (rd32(b + i) == 0x06054b50) { eocd = i; break; }
    if (i == scan_limit) break;
  }
  if (eocd == SIZE_MAX) throw Error("zip end-of-central-directory not found");

  uint64_t num_entries = rd16(b + eocd + 10);
  uint64_t cd_offset = rd32(b + eocd + 16);

  // zip64: locator sits just before the EOCD.
  if ((num_entries == 0xFFFF || cd_offset == 0xFFFFFFFF) && eocd >= 20 &&
      rd32(b + eocd - 20) == 0x07064b50) {
    uint64_t eocd64 = rd64(b + eocd - 20 + 8);
    if (eocd64 + 56 > n || rd32(b + eocd64) != 0x06064b50)
      throw Error("bad zip64 end-of-central-directory");
    num_entries = rd64(b + eocd64 + 32);
    cd_offset = rd64(b + eocd64 + 48);
  }

  std::vector<ZipEntry> entries;
  entries.reserve(num_entries);
  uint64_t pos = cd_offset;
  for (uint64_t e = 0; e < num_entries; ++e) {
    if (pos + 46 > n || rd32(b + pos) != 0x02014b50)
      throw Error("bad central-directory entry");
    uint16_t method = rd16(b + pos + 10);
    uint64_t csize = rd32(b + pos + 20);
    uint64_t usize = rd32(b + pos + 24);
    uint16_t name_len = rd16(b + pos + 28);
    uint16_t extra_len = rd16(b + pos + 30);
    uint16_t comment_len = rd16(b + pos + 32);
    uint64_t lho = rd32(b + pos + 42);
    std::string name((const char*)(b + pos + 46), name_len);

    // zip64 extra field in the central entry.
    const uint8_t* extra = b + pos + 46 + name_len;
    for (uint64_t off = 0; off + 4 <= extra_len;) {
      uint16_t tag = rd16(extra + off), sz = rd16(extra + off + 2);
      if (tag == 0x0001) {
        const uint8_t* f = extra + off + 4;
        if (usize == 0xFFFFFFFF) { usize = rd64(f); f += 8; }
        if (csize == 0xFFFFFFFF) { csize = rd64(f); f += 8; }
        if (lho == 0xFFFFFFFF) { lho = rd64(f); }
      }
      off += 4 + sz;
    }
    if (method != 0)
      throw Error("compressed zip entry (torch.save always STOREs): " + name);

    // Local header gives the true data offset (its extra field carries
    // torch's storage-alignment padding and can differ from the CD's).
    if (lho + 30 > n || rd32(b + lho) != 0x04034b50)
      throw Error("bad local header for " + name);
    uint16_t l_name = rd16(b + lho + 26);
    uint16_t l_extra = rd16(b + lho + 28);
    uint64_t data_off = lho + 30 + l_name + l_extra;
    if (data_off + usize > n) throw Error("entry overruns file: " + name);
    entries.push_back({std::move(name), b + data_off, usize});
    pos += 46 + name_len + extra_len + comment_len;
  }
  return entries;
}

// --------------------------------------------------------------- pickle VM

enum class Kind { None, Bool, Int, Float, Str, List, Dict, Tuple, Global,
                  Storage, Tensor, Mark };

struct Value;
using ValuePtr = std::shared_ptr<Value>;

struct Value {
  Kind kind = Kind::None;
  bool b = false;
  int64_t i = 0;
  double f = 0;
  std::string s;                                   // Str / Global name
  std::vector<ValuePtr> items;                     // List / Tuple
  std::vector<std::pair<ValuePtr, ValuePtr>> kv;   // Dict
  // Storage: s = dtype name, i = numel; storage key in s2.
  std::string s2;
  // Tensor: storage in items[0], offset in i, sizes in items[1..].
};

ValuePtr mk(Kind k) { auto v = std::make_shared<Value>(); v->kind = k; return v; }

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  uint8_t u8() { if (p >= end) throw Error("pickle truncated"); return *p++; }
  const uint8_t* take(size_t k) {
    if (p + k > end) throw Error("pickle truncated");
    const uint8_t* r = p; p += k; return r;
  }
};

// The opcode subset emitted by torch.save across pickle protocols 2-5.
ValuePtr run_pickle(const uint8_t* data, size_t len) {
  Reader r{data, data + len};
  std::vector<ValuePtr> stack;
  std::map<uint64_t, ValuePtr> memo;
  uint64_t memo_next = 0;

  auto pop = [&]() {
    if (stack.empty()) throw Error("pickle stack underflow");
    ValuePtr v = stack.back(); stack.pop_back(); return v;
  };
  auto pop_mark = [&]() {
    std::vector<ValuePtr> items;
    while (!stack.empty() && stack.back()->kind != Kind::Mark)
      items.push_back(pop());
    if (stack.empty()) throw Error("no MARK on stack");
    stack.pop_back();
    std::reverse(items.begin(), items.end());
    return items;
  };
  auto reduce = [&](ValuePtr fn, ValuePtr args) -> ValuePtr {
    if (fn->kind != Kind::Global) throw Error("REDUCE on non-global");
    const std::string& name = fn->s;
    if (name == "torch._utils._rebuild_tensor_v2") {
      // (storage, storage_offset, size, stride, requires_grad, hooks[, meta])
      if (args->items.size() < 4) throw Error("_rebuild_tensor_v2 arity");
      // tensor_bytes assumes contiguous row-major layout; a non-contiguous
      // tensor must throw (triggering the caller's torch.load fallback)
      // rather than be decoded with the wrong element order.
      const ValuePtr& sizes = args->items[2];
      const ValuePtr& strides = args->items[3];
      if (strides->items.size() != sizes->items.size())
        throw Error("_rebuild_tensor_v2 stride/size rank mismatch");
      int64_t expect = 1;
      for (int j = (int)sizes->items.size() - 1; j >= 0; --j) {
        // Dims of extent 1 have arbitrary stride in torch; skip them.
        if (sizes->items[j]->i != 1 && strides->items[j]->i != expect)
          throw Error("non-contiguous tensor in chunk (unsupported)");
        expect *= sizes->items[j]->i;
      }
      auto t = mk(Kind::Tensor);
      t->items.push_back(args->items[0]);  // storage
      t->i = args->items[1]->i;            // offset (elements)
      t->items.push_back(sizes);           // sizes tuple
      return t;
    }
    if (name == "collections.OrderedDict") return mk(Kind::Dict);
    // Unknown reducer (e.g. future metadata): keep an opaque marker so
    // parsing continues; scenes only need keys/cameras/images.
    auto v = mk(Kind::Global);
    v->s = name + "(...)";
    return v;
  };

  for (;;) {
    uint8_t op = r.u8();
    switch (op) {
      case 0x80: r.u8(); break;                                  // PROTO
      case 0x95: r.take(8); break;                               // FRAME
      case '.':                                                   // STOP
        return pop();
      case '(': stack.push_back(mk(Kind::Mark)); break;          // MARK
      case ')': stack.push_back(mk(Kind::Tuple)); break;         // EMPTY_TUPLE
      case ']': stack.push_back(mk(Kind::List)); break;          // EMPTY_LIST
      case '}': stack.push_back(mk(Kind::Dict)); break;          // EMPTY_DICT
      case 'N': stack.push_back(mk(Kind::None)); break;          // NONE
      case 0x88: { auto v = mk(Kind::Bool); v->b = true; stack.push_back(v); break; }
      case 0x89: { auto v = mk(Kind::Bool); v->b = false; stack.push_back(v); break; }
      case 'K': { auto v = mk(Kind::Int); v->i = r.u8(); stack.push_back(v); break; }
      case 'M': { auto v = mk(Kind::Int); v->i = rd16(r.take(2)); stack.push_back(v); break; }
      case 'J': { auto v = mk(Kind::Int); v->i = (int32_t)rd32(r.take(4)); stack.push_back(v); break; }
      case 0x8a: {                                               // LONG1
        uint8_t k = r.u8();
        const uint8_t* q = r.take(k);
        int64_t val = 0;
        for (int j = (int)k - 1; j >= 0; --j) val = (val << 8) | q[j];
        if (k && (q[k - 1] & 0x80)) val -= (int64_t)1 << (8 * k);
        auto v = mk(Kind::Int); v->i = val; stack.push_back(v); break;
      }
      case 'G': {                                                // BINFLOAT
        // Big-endian IEEE double. Floats never participate in the
        // key/cameras/images extraction, but real-world chunks may carry
        // float metadata (fps, timestamps-as-seconds); parse rather than
        // punting the whole chunk to the torch fallback.
        const uint8_t* b = r.take(8);
        uint64_t u = 0;
        for (int k = 0; k < 8; k++) u = (u << 8) | b[k];
        auto v = mk(Kind::Float);
        memcpy(&v->f, &u, 8);
        stack.push_back(v); break;
      }
      case 'B': {                                                // BINBYTES
        uint32_t k = rd32(r.take(4));
        auto v = mk(Kind::Str);
        v->s.assign((const char*)r.take(k), k);
        stack.push_back(v); break;
      }
      case 'C': {                                                // SHORT_BINBYTES
        uint8_t k = r.u8();
        auto v = mk(Kind::Str);
        v->s.assign((const char*)r.take(k), k);
        stack.push_back(v); break;
      }
      case 'X': {                                                // BINUNICODE
        uint32_t k = rd32(r.take(4));
        auto v = mk(Kind::Str);
        v->s.assign((const char*)r.take(k), k);
        stack.push_back(v); break;
      }
      case 0x8c: {                                               // SHORT_BINUNICODE
        uint8_t k = r.u8();
        auto v = mk(Kind::Str);
        v->s.assign((const char*)r.take(k), k);
        stack.push_back(v); break;
      }
      case 'U': {                                                // SHORT_BINSTRING
        uint8_t k = r.u8();
        auto v = mk(Kind::Str);
        v->s.assign((const char*)r.take(k), k);
        stack.push_back(v); break;
      }
      case 'c': {                                                // GLOBAL
        auto v = mk(Kind::Global);
        std::string mod, name;
        while (true) { char ch = (char)r.u8(); if (ch == '\n') break; mod += ch; }
        while (true) { char ch = (char)r.u8(); if (ch == '\n') break; name += ch; }
        v->s = mod + "." + name;
        stack.push_back(v); break;
      }
      case 0x93: {                                               // STACK_GLOBAL
        ValuePtr name = pop(), mod = pop();
        auto v = mk(Kind::Global);
        v->s = mod->s + "." + name->s;
        stack.push_back(v); break;
      }
      case 'q': { memo[r.u8()] = stack.back(); break; }          // BINPUT
      case 'r': { memo[rd32(r.take(4))] = stack.back(); break; } // LONG_BINPUT
      case 0x94: { memo[memo_next++] = stack.back(); break; }    // MEMOIZE
      case 'h': {                                                // BINGET
        auto it = memo.find(r.u8());
        if (it == memo.end()) throw Error("BINGET miss");
        stack.push_back(it->second); break;
      }
      case 'j': {                                                // LONG_BINGET
        auto it = memo.find(rd32(r.take(4)));
        if (it == memo.end()) throw Error("LONG_BINGET miss");
        stack.push_back(it->second); break;
      }
      case 't': {                                                // TUPLE
        auto items = pop_mark();
        auto v = mk(Kind::Tuple); v->items = std::move(items);
        stack.push_back(v); break;
      }
      case 0x85: {                                               // TUPLE1
        auto a = pop(); auto v = mk(Kind::Tuple);
        v->items = {a}; stack.push_back(v); break;
      }
      case 0x86: {                                               // TUPLE2
        auto b2 = pop(); auto a = pop(); auto v = mk(Kind::Tuple);
        v->items = {a, b2}; stack.push_back(v); break;
      }
      case 0x87: {                                               // TUPLE3
        auto c = pop(); auto b2 = pop(); auto a = pop();
        auto v = mk(Kind::Tuple); v->items = {a, b2, c};
        stack.push_back(v); break;
      }
      case 'a': {                                                // APPEND
        auto x = pop();
        if (stack.empty() || stack.back()->kind != Kind::List)
          throw Error("APPEND to non-list");
        stack.back()->items.push_back(x); break;
      }
      case 'e': {                                                // APPENDS
        auto items = pop_mark();
        if (stack.empty() || stack.back()->kind != Kind::List)
          throw Error("APPENDS to non-list");
        auto& l = stack.back()->items;
        l.insert(l.end(), items.begin(), items.end()); break;
      }
      case 's': {                                                // SETITEM
        auto val = pop(); auto key = pop();
        if (stack.empty() || stack.back()->kind != Kind::Dict)
          throw Error("SETITEM on non-dict");
        stack.back()->kv.emplace_back(key, val); break;
      }
      case 'u': {                                                // SETITEMS
        auto items = pop_mark();
        if (stack.empty() || stack.back()->kind != Kind::Dict)
          throw Error("SETITEMS on non-dict");
        if (items.size() % 2) throw Error("odd SETITEMS");
        for (size_t j = 0; j < items.size(); j += 2)
          stack.back()->kv.emplace_back(items[j], items[j + 1]);
        break;
      }
      case 'Q': {                                                // BINPERSID
        // ('storage', StorageType, key, location, numel)
        auto pid = pop();
        if (pid->kind != Kind::Tuple || pid->items.size() < 5 ||
            pid->items[0]->s != "storage")
          throw Error("unsupported persistent id");
        auto v = mk(Kind::Storage);
        v->s = pid->items[1]->s;    // e.g. torch.FloatStorage
        v->s2 = pid->items[2]->s;   // storage key in the zip
        v->i = pid->items[4]->i;    // numel
        stack.push_back(v); break;
      }
      case 'R': {                                                // REDUCE
        auto args = pop(); auto fn = pop();
        stack.push_back(reduce(fn, args)); break;
      }
      case '2': {                                                // DUP
        stack.push_back(stack.back()); break;
      }
      case '0': pop(); break;                                    // POP
      default: {
        char msg[64];
        snprintf(msg, sizeof(msg), "unsupported pickle opcode 0x%02x", op);
        throw Error(msg);
      }
    }
  }
}

// ---------------------------------------------------------------- chunk API

struct Scene {
  std::string key;
  std::vector<float> cameras;  // row-major
  int cam_rows = 0, cam_cols = 0;
  std::vector<std::pair<const uint8_t*, uint64_t>> images;  // JPEG views
};

struct Chunk {
  std::vector<uint8_t> file;   // owns all storage payload memory
  std::vector<Scene> scenes;
};

ValuePtr dict_get(const ValuePtr& d, const std::string& key) {
  for (auto& [k, v] : d->kv)
    if (k->kind == Kind::Str && k->s == key) return v;
  return nullptr;
}

size_t dtype_size(const std::string& storage) {
  // Longer / more specific names first: "BFloat16Storage" contains "Float",
  // so testing "Float" first would silently mis-size bf16 tensors.
  if (storage.find("BFloat16") != std::string::npos) return 2;
  if (storage.find("Float") != std::string::npos) return 4;
  if (storage.find("Double") != std::string::npos) return 8;
  if (storage.find("Half") != std::string::npos) return 2;
  if (storage.find("Long") != std::string::npos) return 8;
  if (storage.find("Int") != std::string::npos) return 4;
  if (storage.find("Short") != std::string::npos) return 2;
  if (storage.find("Byte") != std::string::npos) return 1;
  if (storage.find("Char") != std::string::npos) return 1;
  if (storage.find("Bool") != std::string::npos) return 1;
  throw Error("unknown storage dtype: " + storage);
}

Chunk* load_chunk(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) throw Error(std::string("cannot open ") + path);
  auto chunk = std::make_unique<Chunk>();
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  chunk->file.resize(sz);
  if (fread(chunk->file.data(), 1, sz, f) != (size_t)sz) {
    fclose(f);
    throw Error(std::string("short read on ") + path);
  }
  fclose(f);

  auto entries = parse_zip(chunk->file);
  const ZipEntry* pkl = nullptr;
  std::map<std::string, const ZipEntry*> storages;
  for (auto& e : entries) {
    auto slash = e.name.find('/');
    std::string rel = slash == std::string::npos ? e.name
                                                 : e.name.substr(slash + 1);
    if (rel == "data.pkl") pkl = &e;
    else if (rel.rfind("data/", 0) == 0) storages[rel.substr(5)] = &e;
  }
  if (!pkl) throw Error("data.pkl not found in archive");

  ValuePtr root = run_pickle(pkl->data, pkl->size);
  if (root->kind != Kind::List) throw Error("chunk root is not a list");

  auto tensor_bytes = [&](const ValuePtr& t)
      -> std::pair<const uint8_t*, uint64_t> {
    if (t->kind != Kind::Tensor) throw Error("expected a tensor");
    const ValuePtr& st = t->items[0];
    auto it = storages.find(st->s2);
    if (it == storages.end()) throw Error("missing storage " + st->s2);
    size_t esz = dtype_size(st->s);
    uint64_t numel = 1;
    for (auto& d : t->items[1]->items) numel *= (uint64_t)d->i;
    uint64_t off = (uint64_t)t->i * esz;
    if (off + numel * esz > it->second->size)
      throw Error("tensor overruns storage " + st->s2);
    return {it->second->data + off, numel * esz};
  };

  for (auto& ex : root->items) {
    if (ex->kind != Kind::Dict) throw Error("scene entry is not a dict");
    Scene s;
    ValuePtr key = dict_get(ex, "key");
    ValuePtr cams = dict_get(ex, "cameras");
    ValuePtr imgs = dict_get(ex, "images");
    if (!key || !cams || !imgs)
      throw Error("scene missing key/cameras/images");
    s.key = key->s;

    if (cams->items[0]->s.find("Float") == std::string::npos ||
        cams->items[0]->s.find("BFloat16") != std::string::npos)
      throw Error("cameras storage is not float32");
    auto [cb, cn] = tensor_bytes(cams);
    s.cam_rows = (int)cams->items[1]->items[0]->i;
    s.cam_cols = cams->items[1]->items.size() > 1
                     ? (int)cams->items[1]->items[1]->i : 1;
    s.cameras.resize(cn / 4);
    memcpy(s.cameras.data(), cb, cn);

    if (imgs->kind != Kind::List) throw Error("images is not a list");
    for (auto& im : imgs->items) s.images.push_back(tensor_bytes(im));
    chunk->scenes.push_back(std::move(s));
  }
  return chunk.release();
}

}  // namespace

extern "C" {

void* mvldm_chunk_open(const char* path, char* err, int errlen) {
  try {
    return load_chunk(path);
  } catch (const std::exception& e) {
    if (err && errlen > 0) {
      strncpy(err, e.what(), errlen - 1);
      err[errlen - 1] = 0;
    }
    return nullptr;
  }
}

int mvldm_chunk_num_scenes(void* h) {
  return (int)((Chunk*)h)->scenes.size();
}

const char* mvldm_scene_key(void* h, int i) {
  return ((Chunk*)h)->scenes[i].key.c_str();
}

const float* mvldm_scene_cameras(void* h, int i, int* rows, int* cols) {
  Scene& s = ((Chunk*)h)->scenes[i];
  *rows = s.cam_rows;
  *cols = s.cam_cols;
  return s.cameras.data();
}

int mvldm_scene_num_images(void* h, int i) {
  return (int)((Chunk*)h)->scenes[i].images.size();
}

const unsigned char* mvldm_scene_image(void* h, int i, int j, long* nbytes) {
  auto& im = ((Chunk*)h)->scenes[i].images[j];
  *nbytes = (long)im.second;
  return im.first;
}

void mvldm_chunk_free(void* h) { delete (Chunk*)h; }

}  // extern "C"
