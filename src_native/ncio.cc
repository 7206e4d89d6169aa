// Native NetCDF classic (CDF-1 / CDF-2 / CDF-5) codec.
//
// The TPU-native framework's counterpart of the reference's C++ NetCDF RAII
// wrapper (`include_test/Netcdf_interface.h:31-110`): where the reference
// links libnetcdf, this is a self-contained, dependency-free implementation
// of the classic on-disk format — reader for all three classic variants and
// writer for CDF-2 (64-bit offset) files — exposed through a C API consumed
// from Python via ctypes (`rte_rrtmgp_tpu/utils/native.py`).
//
// Format reference: the NetCDF classic format specification (the `magic
// numrecs dim_list gatt_list var_list data` grammar). All header integers
// are big-endian; CDF-5 widens every non-negative size field to 64 bits.
//
// Thread-safety: distinct handles are independent; a single handle must not
// be shared across threads without external locking.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---- NetCDF external type codes (on-disk) ----
enum NcType : int32_t {
  NC_BYTE = 1,
  NC_CHAR = 2,
  NC_SHORT = 3,
  NC_INT = 4,
  NC_FLOAT = 5,
  NC_DOUBLE = 6,
  NC_UBYTE = 7,
  NC_USHORT = 8,
  NC_UINT = 9,
  NC_INT64 = 10,
  NC_UINT64 = 11,
};

enum Tag : int32_t {
  TAG_DIMENSION = 0x0A,
  TAG_VARIABLE = 0x0B,
  TAG_ATTRIBUTE = 0x0C,
  TAG_ABSENT = 0x00,
};

size_t type_size(int32_t t) {
  switch (t) {
    case NC_BYTE: case NC_CHAR: case NC_UBYTE: return 1;
    case NC_SHORT: case NC_USHORT: return 2;
    case NC_INT: case NC_UINT: case NC_FLOAT: return 4;
    case NC_DOUBLE: case NC_INT64: case NC_UINT64: return 8;
    default: return 0;
  }
}

struct Dim {
  std::string name;
  int64_t len;  // 0 on disk == record (unlimited) dimension
};

struct Att {
  std::string name;
  int32_t type;
  std::vector<uint8_t> data;  // raw little-endian (host order) payload
};

struct Var {
  std::string name;
  std::vector<int32_t> dimids;
  std::vector<Att> atts;
  int32_t type = NC_FLOAT;
  int64_t vsize = 0;   // per spec (record vars: one record's worth, padded)
  int64_t begin = 0;
  bool is_record = false;
  std::vector<int64_t> shape;  // resolved lens; record dim resolved to numrecs
};

struct File {
  FILE* fp = nullptr;
  int version = 1;          // 1, 2, or 5
  int64_t numrecs = 0;
  std::vector<Dim> dims;
  std::vector<Att> gatts;
  std::vector<Var> vars;
  int64_t recsize = 0;
  std::string error;
  ~File() { if (fp) fclose(fp); }
};

// ---- big-endian readers ----
struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  bool need(size_t n) {
    if (!ok || (size_t)(end - p) < n) { ok = false; return false; }
    return true;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v = ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                 ((uint32_t)p[2] << 8) | (uint32_t)p[3];
    p += 4;
    return v;
  }
  uint64_t u64() {
    uint64_t hi = u32();
    uint64_t lo = u32();
    return (hi << 32) | lo;
  }
  // Non-negative size field: 4 bytes in CDF-1/2, 8 in CDF-5.
  int64_t nonneg(int version) {
    return version == 5 ? (int64_t)u64() : (int64_t)(int32_t)u32();
  }
  std::string name(int version) {
    int64_t n = nonneg(version);
    if (n < 0 || !need((size_t)((n + 3) / 4 * 4))) { ok = false; return ""; }
    std::string s((const char*)p, (size_t)n);
    p += (n + 3) / 4 * 4;  // names padded to 4-byte boundary
    return s;
  }
  std::vector<uint8_t> bytes_padded(int64_t nbytes) {
    int64_t padded = (nbytes + 3) / 4 * 4;
    if (nbytes < 0 || !need((size_t)padded)) { ok = false; return {}; }
    std::vector<uint8_t> out(p, p + nbytes);
    p += padded;
    return out;
  }
};

// Convert big-endian on-disk payload to host (little-endian) order in place.
void be_to_host(uint8_t* data, size_t count, size_t elem) {
  if (elem <= 1) return;
  for (size_t i = 0; i < count; ++i) {
    uint8_t* e = data + i * elem;
    for (size_t a = 0, b = elem - 1; a < b; ++a, --b) std::swap(e[a], e[b]);
  }
}

std::vector<Att> parse_att_list(Cursor& c, int version) {
  std::vector<Att> atts;
  int32_t tag = (int32_t)c.u32();
  int64_t n = c.nonneg(version);
  if (tag == TAG_ABSENT || n == 0) return atts;
  if (tag != TAG_ATTRIBUTE) { c.ok = false; return atts; }
  for (int64_t i = 0; i < n && c.ok; ++i) {
    Att a;
    a.name = c.name(version);
    a.type = (int32_t)c.u32();
    int64_t nelems = c.nonneg(version);
    size_t es = type_size(a.type);
    if (!es) { c.ok = false; break; }
    a.data = c.bytes_padded(nelems * (int64_t)es);
    be_to_host(a.data.data(), (size_t)nelems, es);
    atts.push_back(std::move(a));
  }
  return atts;
}

bool parse_header(File& f, const std::vector<uint8_t>& hdr) {
  Cursor c{hdr.data(), hdr.data() + hdr.size()};
  if (!c.need(4)) return false;
  if (memcmp(c.p, "CDF", 3) != 0) { f.error = "not a classic NetCDF file"; return false; }
  f.version = c.p[3];
  if (f.version != 1 && f.version != 2 && f.version != 5) {
    f.error = "unsupported CDF version";
    return false;
  }
  c.p += 4;
  uint32_t nr = c.u32();
  if (f.version == 5) {
    uint32_t lo = c.u32();
    f.numrecs = ((int64_t)nr << 32) | lo;
  } else {
    f.numrecs = (nr == 0xFFFFFFFFu) ? -1 : (int64_t)nr;  // STREAMING
  }

  // dim_list
  int32_t tag = (int32_t)c.u32();
  int64_t ndims = c.nonneg(f.version);
  if (tag == TAG_DIMENSION) {
    for (int64_t i = 0; i < ndims && c.ok; ++i) {
      Dim d;
      d.name = c.name(f.version);
      d.len = c.nonneg(f.version);
      f.dims.push_back(std::move(d));
    }
  } else if (tag != TAG_ABSENT || ndims != 0) {
    f.error = "bad dim_list";
    return false;
  }

  f.gatts = parse_att_list(c, f.version);

  tag = (int32_t)c.u32();
  int64_t nvars = c.nonneg(f.version);
  if (tag == TAG_VARIABLE) {
    for (int64_t i = 0; i < nvars && c.ok; ++i) {
      Var v;
      v.name = c.name(f.version);
      int64_t nd = c.nonneg(f.version);
      // Per spec, each per-variable dimid is itself a NON_NEG field:
      // 4 bytes in CDF-1/2, 8 bytes in CDF-5.
      for (int64_t k = 0; k < nd && c.ok; ++k)
        v.dimids.push_back((int32_t)c.nonneg(f.version));
      v.atts = parse_att_list(c, f.version);
      v.type = (int32_t)c.u32();
      v.vsize = c.nonneg(f.version);
      v.begin = (f.version == 1) ? (int64_t)(int32_t)c.u32() : (int64_t)c.u64();
      f.vars.push_back(std::move(v));
    }
  } else if (tag != TAG_ABSENT || nvars != 0) {
    f.error = "bad var_list";
    return false;
  }
  if (!c.ok) { f.error = "truncated header"; return false; }

  // Resolve shapes; compute record size.
  for (auto& v : f.vars) {
    v.is_record = false;
    for (size_t k = 0; k < v.dimids.size(); ++k) {
      int32_t id = v.dimids[k];
      if (id < 0 || (size_t)id >= f.dims.size()) { f.error = "bad dimid"; return false; }
      int64_t len = f.dims[id].len;
      if (len == 0 && k == 0) {  // record dimension (must be first)
        v.is_record = true;
        len = f.numrecs < 0 ? 0 : f.numrecs;
      }
      v.shape.push_back(len);
    }
    if (v.is_record) f.recsize += v.vsize;
  }
  // Spec special case: if exactly one record variable, recsize is its
  // unpadded record size.
  {
    std::vector<Var*> recs;
    for (auto& v : f.vars) if (v.is_record) recs.push_back(&v);
    if (recs.size() == 1) {
      Var& v = *recs[0];
      int64_t n = (int64_t)type_size(v.type);
      for (size_t k = 1; k < v.shape.size(); ++k) n *= v.shape[k];
      f.recsize = n;
    }
  }
  return true;
}

int64_t elem_count(const Var& v) {
  int64_t n = 1;
  for (int64_t s : v.shape) n *= s;
  return n;
}

// 64-bit-clean seek: CDF-2/CDF-5 begin offsets exceed 2 GiB; a plain
// fseek(long) would truncate them on ILP32 platforms.
int nc_seek(FILE* fp, int64_t off) {
#if defined(_WIN32)
  return _fseeki64(fp, off, SEEK_SET);
#else
  return fseeko(fp, (off_t)off, SEEK_SET);
#endif
}

}  // namespace

// ============================== C API: reader ==============================

extern "C" {

void* rrtmgp_nc_open(const char* path) {
  auto f = std::make_unique<File>();
  f->fp = fopen(path, "rb");
  if (!f->fp) return nullptr;
  // Read the whole header: it precedes the first variable's data. Read a
  // growing prefix until parsing succeeds or the begin of data is reached.
  // Simpler: read min(filesize, 1 MiB), grow on parse failure.
  std::vector<uint8_t> hdr;
  size_t cap = 1 << 20;
  for (int attempt = 0; attempt < 12; ++attempt) {
    fseek(f->fp, 0, SEEK_SET);
    hdr.resize(cap);
    size_t got = fread(hdr.data(), 1, cap, f->fp);
    hdr.resize(got);
    f->dims.clear();
    f->gatts.clear();
    f->vars.clear();
    f->recsize = 0;
    f->error.clear();
    if (parse_header(*f, hdr)) return f.release();
    if (got < cap) return nullptr;  // whole file read and still failing
    cap *= 4;
  }
  return nullptr;
}

void rrtmgp_nc_close(void* h) { delete (File*)h; }

int rrtmgp_nc_num_vars(void* h) { return (int)((File*)h)->vars.size(); }
int rrtmgp_nc_num_dims(void* h) { return (int)((File*)h)->dims.size(); }

const char* rrtmgp_nc_var_name(void* h, int i) {
  File* f = (File*)h;
  if (i < 0 || (size_t)i >= f->vars.size()) return nullptr;
  return f->vars[i].name.c_str();
}

const char* rrtmgp_nc_dim_name(void* h, int i) {
  File* f = (File*)h;
  if (i < 0 || (size_t)i >= f->dims.size()) return nullptr;
  return f->dims[i].name.c_str();
}

long long rrtmgp_nc_dim_len(void* h, int i) {
  File* f = (File*)h;
  if (i < 0 || (size_t)i >= f->dims.size()) return -1;
  int64_t len = f->dims[i].len;
  return len == 0 ? (f->numrecs < 0 ? 0 : f->numrecs) : len;
}

int rrtmgp_nc_find_var(void* h, const char* name) {
  File* f = (File*)h;
  for (size_t i = 0; i < f->vars.size(); ++i)
    if (f->vars[i].name == name) return (int)i;
  return -1;
}

int rrtmgp_nc_var_type(void* h, int i) { return ((File*)h)->vars[i].type; }
int rrtmgp_nc_var_ndims(void* h, int i) {
  return (int)((File*)h)->vars[i].shape.size();
}
void rrtmgp_nc_var_shape(void* h, int i, long long* out) {
  File* f = (File*)h;
  for (size_t k = 0; k < f->vars[i].shape.size(); ++k)
    out[k] = f->vars[i].shape[k];
}

// Reads the full variable into dst (host byte order). Returns 0 on success.
int rrtmgp_nc_read_var(void* h, int i, void* dst, long long dst_bytes) {
  File* f = (File*)h;
  if (i < 0 || (size_t)i >= f->vars.size()) return -1;
  const Var& v = f->vars[i];
  size_t es = type_size(v.type);
  int64_t n = elem_count(v);
  if ((int64_t)es * n != dst_bytes) return -2;

  uint8_t* out = (uint8_t*)dst;
  if (!v.is_record) {
    if (nc_seek(f->fp, v.begin) != 0) return -3;
    if (fread(out, 1, (size_t)(es * n), f->fp) != (size_t)(es * n)) return -3;
  } else {
    int64_t per_rec_elems = 1;
    for (size_t k = 1; k < v.shape.size(); ++k) per_rec_elems *= v.shape[k];
    int64_t per_rec_bytes = per_rec_elems * (int64_t)es;
    int64_t nrec = v.shape.empty() ? 0 : v.shape[0];
    for (int64_t r = 0; r < nrec; ++r) {
      if (nc_seek(f->fp, v.begin + r * f->recsize) != 0) return -3;
      if (fread(out + r * per_rec_bytes, 1, (size_t)per_rec_bytes, f->fp)
          != (size_t)per_rec_bytes) return -3;
    }
  }
  be_to_host(out, (size_t)n, es);
  return 0;
}

// Variable attribute lookup (text attributes; returns nullptr if absent).
const char* rrtmgp_nc_att_text(void* h, int varid, const char* name) {
  File* f = (File*)h;
  const std::vector<Att>* atts =
      varid < 0 ? &f->gatts
                : ((size_t)varid < f->vars.size() ? &f->vars[varid].atts : nullptr);
  if (!atts) return nullptr;
  for (const auto& a : *atts) {
    if (a.name == name && a.type == NC_CHAR) {
      // NUL-terminate in a static-thread-local scratch owned by the handle.
      static thread_local std::string scratch;
      scratch.assign((const char*)a.data.data(), a.data.size());
      return scratch.c_str();
    }
  }
  return nullptr;
}

}  // extern "C" (reader)

// ============================== C API: writer ==============================

namespace {

struct WVar {
  std::string name;
  std::vector<int32_t> dimids;
  std::vector<Att> atts;
  int32_t type;
  std::vector<uint8_t> data;  // host order payload
};

struct Writer {
  std::string path;
  std::vector<Dim> dims;
  std::vector<Att> gatts;
  std::vector<WVar> vars;
  std::string error;
};

struct Emit {
  std::vector<uint8_t> out;
  void u32(uint32_t v) {
    out.push_back((uint8_t)(v >> 24));
    out.push_back((uint8_t)(v >> 16));
    out.push_back((uint8_t)(v >> 8));
    out.push_back((uint8_t)v);
  }
  void u64(uint64_t v) { u32((uint32_t)(v >> 32)); u32((uint32_t)v); }
  void name(const std::string& s) {
    u32((uint32_t)s.size());
    out.insert(out.end(), s.begin(), s.end());
    while (out.size() % 4) out.push_back(0);
  }
  void att_payload_be(const Att& a) {
    size_t es = type_size(a.type);
    size_t n = a.data.size() / es;
    u32((uint32_t)n);
    size_t at = out.size();
    out.insert(out.end(), a.data.begin(), a.data.end());
    be_to_host(out.data() + at, n, es);  // host -> big-endian (symmetric swap)
    while (out.size() % 4) out.push_back(0);
  }
  void att_list(const std::vector<Att>& atts) {
    if (atts.empty()) { u32(TAG_ABSENT); u32(0); return; }
    u32(TAG_ATTRIBUTE);
    u32((uint32_t)atts.size());
    for (const auto& a : atts) {
      name(a.name);
      u32((uint32_t)a.type);
      att_payload_be(a);
    }
  }
};

}  // namespace

extern "C" {

void* rrtmgp_ncw_create(const char* path) {
  auto w = new Writer();
  w->path = path;
  return w;
}

int rrtmgp_ncw_def_dim(void* h, const char* name, long long len) {
  Writer* w = (Writer*)h;
  for (size_t i = 0; i < w->dims.size(); ++i)
    if (w->dims[i].name == name)
      return w->dims[i].len == len ? (int)i : -1;
  w->dims.push_back(Dim{name, len});
  return (int)w->dims.size() - 1;
}

int rrtmgp_ncw_def_var(void* h, const char* name, int type, int ndims,
                       const int* dimids) {
  Writer* w = (Writer*)h;
  WVar v;
  v.name = name;
  v.type = type;
  for (int i = 0; i < ndims; ++i) {
    if (dimids[i] < 0 || (size_t)dimids[i] >= w->dims.size()) return -1;
    v.dimids.push_back(dimids[i]);
  }
  w->vars.push_back(std::move(v));
  return (int)w->vars.size() - 1;
}

int rrtmgp_ncw_put_att_text(void* h, int varid, const char* name,
                            const char* value) {
  Writer* w = (Writer*)h;
  Att a;
  a.name = name;
  a.type = NC_CHAR;
  a.data.assign((const uint8_t*)value, (const uint8_t*)value + strlen(value));
  if (varid < 0) w->gatts.push_back(std::move(a));
  else if ((size_t)varid < w->vars.size()) w->vars[varid].atts.push_back(std::move(a));
  else return -1;
  return 0;
}

int rrtmgp_ncw_put_var(void* h, int varid, const void* data,
                       long long nbytes) {
  Writer* w = (Writer*)h;
  if (varid < 0 || (size_t)varid >= w->vars.size()) return -1;
  WVar& v = w->vars[varid];
  int64_t n = 1;
  for (int32_t id : v.dimids) n *= w->dims[id].len;
  if (n * (int64_t)type_size(v.type) != nbytes) return -2;
  v.data.assign((const uint8_t*)data, (const uint8_t*)data + nbytes);
  return 0;
}

// Writes a CDF-2 (64-bit offset) file. Returns 0 on success.
int rrtmgp_ncw_close(void* h) {
  std::unique_ptr<Writer> w((Writer*)h);

  Emit e;
  e.out.insert(e.out.end(), {'C', 'D', 'F', 2});
  e.u32(0);  // numrecs (no record variables)

  if (w->dims.empty()) { e.u32(TAG_ABSENT); e.u32(0); }
  else {
    e.u32(TAG_DIMENSION);
    e.u32((uint32_t)w->dims.size());
    for (const auto& d : w->dims) { e.name(d.name); e.u32((uint32_t)d.len); }
  }
  e.att_list(w->gatts);

  // Variable list needs data offsets: emit once with zero offsets to learn
  // the header size, then patch.
  struct Layout { int64_t vsize, begin; };
  std::vector<Layout> lay(w->vars.size());

  auto emit_vars = [&](Emit& em) {
    if (w->vars.empty()) { em.u32(TAG_ABSENT); em.u32(0); return; }
    em.u32(TAG_VARIABLE);
    em.u32((uint32_t)w->vars.size());
    for (size_t i = 0; i < w->vars.size(); ++i) {
      const WVar& v = w->vars[i];
      em.name(v.name);
      em.u32((uint32_t)v.dimids.size());
      for (int32_t id : v.dimids) em.u32((uint32_t)id);
      em.att_list(v.atts);
      em.u32((uint32_t)v.type);
      int64_t vsize = (lay[i].vsize + 3) / 4 * 4;
      em.u32((uint32_t)(vsize > 0xFFFFFFFFll ? 0xFFFFFFFFll : vsize));
      em.u64((uint64_t)lay[i].begin);
    }
  };

  for (size_t i = 0; i < w->vars.size(); ++i)
    lay[i].vsize = (int64_t)w->vars[i].data.size();

  Emit probe = e;
  emit_vars(probe);
  int64_t header_size = (int64_t)probe.out.size();

  int64_t at = header_size;
  for (size_t i = 0; i < w->vars.size(); ++i) {
    lay[i].begin = at;
    at += (lay[i].vsize + 3) / 4 * 4;
  }
  emit_vars(e);

  FILE* fp = fopen(w->path.c_str(), "wb");
  if (!fp) return -1;
  if (fwrite(e.out.data(), 1, e.out.size(), fp) != e.out.size()) {
    fclose(fp);
    return -2;
  }
  for (size_t i = 0; i < w->vars.size(); ++i) {
    const WVar& v = w->vars[i];
    size_t es = type_size(v.type);
    std::vector<uint8_t> be(v.data);
    be_to_host(be.data(), be.size() / es, es);  // host -> big-endian
    size_t padded = (be.size() + 3) / 4 * 4;
    be.resize(padded, 0);
    if (fwrite(be.data(), 1, be.size(), fp) != be.size()) {
      fclose(fp);
      return -2;
    }
  }
  return fclose(fp) == 0 ? 0 : -3;
}

void rrtmgp_ncw_abort(void* h) { delete (Writer*)h; }

}  // extern "C" (writer)
