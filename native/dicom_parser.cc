// Fast DICOM tag/pixel parser for the multi-echo CSE series loader.
//
// The reference framework has no native components (SURVEY.md §2.8); this
// is the TPU framework's native IO path: series loading is host-side work
// on the training critical path when feeding from DICOM folders
// (train-IDEAL-unsup --train_data DICOM), and the python parser walks the
// byte stream tag by tag. This parser does the same walk in C++ (~20×
// faster per file) and is exposed through a C ABI consumed with ctypes
// (ideal_gan_tpu/data/dicom_native.py). Little-endian explicit/implicit VR,
// the tag subset the loader needs (data.py:417-480 semantics).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;

  bool ok(size_t k) const { return pos + k <= n; }
  uint16_t u16() { uint16_t v; memcpy(&v, p + pos, 2); pos += 2; return v; }
  uint32_t u32() { uint32_t v; memcpy(&v, p + pos, 4); pos += 4; return v; }
};

bool is_vr(const uint8_t* q) {
  return q[0] >= 'A' && q[0] <= 'Z' && q[1] >= 'A' && q[1] <= 'Z';
}

bool long_vr(const char* vr) {
  static const char* kLong[] = {"OB", "OW", "OF", "SQ", "UT", "UN"};
  for (const char* v : kLong)
    if (vr[0] == v[0] && vr[1] == v[1]) return true;
  return false;
}

}  // namespace

extern "C" {

// Parsed per-file metadata + pixel pointer into an internally owned buffer.
struct DicomInfo {
  int32_t rows;
  int32_t cols;
  int32_t echo_num;      // (0018,0086)
  int32_t echo_train;    // (0018,0091)
  double slice_pos;      // last component of (0020,0032)
  double rescale_i;      // (2005,100D)
  double rescale_s;      // (2005,100E)
  char component;        // (2005,1011): 'M' or 'P'
  const uint16_t* pixels;
  int64_t n_pixels;
};

// Parse one DICOM file. Returns an opaque handle (the file buffer) or
// nullptr on failure; the caller frees it with dicom_free.
void* dicom_parse(const char* path, DicomInfo* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  auto* buf = new std::vector<uint8_t>(size);
  if (fread(buf->data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    delete buf;
    return nullptr;
  }
  fclose(f);

  Reader r{buf->data(), buf->size()};
  if (r.n >= 132 && memcmp(r.p + 128, "DICM", 4) == 0) r.pos = 132;

  memset(out, 0, sizeof(*out));
  out->component = 'M';
  out->echo_num = 1;
  out->echo_train = 1;
  out->rescale_s = 1.0;

  while (r.ok(8)) {
    uint16_t group = r.u16();
    uint16_t elem = r.u16();
    char vr[3] = {0, 0, 0};
    uint32_t length;
    if (group != 0xFFFE && is_vr(r.p + r.pos)) {
      vr[0] = r.p[r.pos];
      vr[1] = r.p[r.pos + 1];
      r.pos += 2;
      if (long_vr(vr)) {
        r.pos += 2;  // reserved
        if (!r.ok(4)) break;
        length = r.u32();
      } else {
        if (!r.ok(2)) break;
        length = r.u16();
      }
    } else {
      if (!r.ok(4)) break;
      length = r.u32();
    }
    if (length == 0xFFFFFFFF) break;  // undefined-length sequences: stop
    if (!r.ok(length)) break;

    const char* val = reinterpret_cast<const char*>(r.p + r.pos);
    auto as_str = [&]() { return std::string(val, length); };
    auto as_f = [&]() {
      try { return std::stod(as_str()); } catch (...) { return 0.0; }
    };

    uint32_t tag = (static_cast<uint32_t>(group) << 16) | elem;
    switch (tag) {
      case 0x00280010:  // Rows
        out->rows = (length == 2) ? *reinterpret_cast<const uint16_t*>(val)
                                  : static_cast<int32_t>(as_f());
        break;
      case 0x00280011:  // Columns
        out->cols = (length == 2) ? *reinterpret_cast<const uint16_t*>(val)
                                  : static_cast<int32_t>(as_f());
        break;
      case 0x00180086: out->echo_num = static_cast<int32_t>(as_f()); break;
      case 0x00180091: out->echo_train = static_cast<int32_t>(as_f()); break;
      case 0x20051011:
        if (length > 0) out->component = val[0];
        break;
      case 0x2005100D: out->rescale_i = as_f(); break;
      case 0x2005100E: {
        double v = as_f();
        out->rescale_s = (v == 0.0) ? 1.0 : v;
        break;
      }
      case 0x00200032: {  // ImagePositionPatient "x\y\z"
        std::string s = as_str();
        size_t k = s.rfind('\\');
        try {
          out->slice_pos = std::stod(k == std::string::npos ? s
                                                            : s.substr(k + 1));
        } catch (...) {}
        break;
      }
      case 0x7FE00010:  // PixelData
        out->pixels = reinterpret_cast<const uint16_t*>(val);
        out->n_pixels = length / 2;
        break;
      default:
        break;
    }
    r.pos += length;
    if (tag == 0x7FE00010) break;
  }
  return buf;
}

void dicom_free(void* handle) {
  delete reinterpret_cast<std::vector<uint8_t>*>(handle);
}

}  // extern "C"
