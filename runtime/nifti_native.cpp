// Native NIfTI-1 decode path for the host data loader.
//
// The reference stack leans on nibabel (C-backed) + torch DataLoader
// worker processes for volume decode (utils/dataloader.py:149-150 of
// fransiskusbudi/multimodal_segmentation_project). This framework's
// equivalent native component fuses, in one pass without the GIL:
//   * gzip inflate (zlib) of .nii.gz payloads,
//   * NIfTI-1 header parse (dims, dtype, scl_slope/inter),
//   * voxel decode to float32 with scaling applied,
//   * optional intensity normalization (CT window [-160,240] -> [0,1])
//     so the Python layer receives training-ready tensors.
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in the
// image). The Python wrapper (data/native.py) falls back to the pure
// Python reader when the shared library has not been built.
//
// Build: make -C runtime   (produces runtime/libnifti_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

template <typename T>
static void decode_to_f32(const uint8_t* src, float* dst, int64_t n,
                          float slope, float inter) {
  const T* s = (const T*)src;
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else {
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i] * slope + inter;
  }
}

extern "C" {

struct NiftiMeta {
  int64_t dim[3];
  int32_t datatype;
  float scl_slope;
  float scl_inter;
  double affine[12];  // rows 0..2 of the 4x4 sform
  int32_t sform_code;
  int32_t qform_code;
};

// error codes
enum {
  NN_OK = 0,
  NN_EIO = -1,
  NN_EGZIP = -2,
  NN_EHDR = -3,
  NN_EDTYPE = -4,
  NN_ESIZE = -5,
};

static int read_all(const char* path, uint8_t** out, size_t* out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return NN_EIO;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t* buf = (uint8_t*)malloc(n);
  if (!buf) {
    fclose(f);
    return NN_ESIZE;
  }
  if (fread(buf, 1, n, f) != (size_t)n) {
    free(buf);
    fclose(f);
    return NN_EIO;
  }
  fclose(f);
  *out = buf;
  *out_len = (size_t)n;
  return NN_OK;
}

// Inflate only the first `want` bytes (header probe): stops the
// decompressor as soon as the fixed-size output fills, so metadata
// queries don't pay for inflating the whole voxel payload.
static int gunzip_prefix(const uint8_t* in, size_t in_len, uint8_t* out,
                         size_t want) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return NN_EGZIP;
  zs.next_in = (Bytef*)in;
  zs.avail_in = in_len;
  zs.next_out = out;
  zs.avail_out = want;
  int rc = inflate(&zs, Z_NO_FLUSH);
  inflateEnd(&zs);
  if (zs.avail_out != 0 && rc != Z_STREAM_END) return NN_EGZIP;
  return NN_OK;
}

static int gunzip(const uint8_t* in, size_t in_len, uint8_t** out,
                  size_t* out_len) {
  // ISIZE footer gives the uncompressed size mod 2^32 — fine for <4GB
  // volumes; grow if it lies.
  size_t cap = in_len >= 4
                   ? (size_t) * (const uint32_t*)(in + in_len - 4)
                   : in_len * 4;
  if (cap < in_len) cap = in_len * 4;
  uint8_t* buf = (uint8_t*)malloc(cap ? cap : 1);
  if (!buf) return NN_ESIZE;

  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
    free(buf);
    return NN_EGZIP;
  }
  zs.next_in = (Bytef*)in;
  zs.avail_in = in_len;
  size_t used = 0;
  int rc;
  do {
    if (used == cap) {
      cap = cap * 2;
      uint8_t* nb = (uint8_t*)realloc(buf, cap);
      if (!nb) {
        inflateEnd(&zs);
        free(buf);
        return NN_ESIZE;
      }
      buf = nb;
    }
    zs.next_out = buf + used;
    zs.avail_out = cap - used;
    rc = inflate(&zs, Z_NO_FLUSH);
    used = cap - zs.avail_out;
  } while (rc == Z_OK);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END) {
    free(buf);
    return NN_EGZIP;
  }
  *out = buf;
  *out_len = used;
  return NN_OK;
}

// norm_mode: 0 = none, 1 = CT abdominal window [-160, 240] -> [0, 1]
int nifti_load_f32(const char* path, float* dst, int64_t dst_capacity,
                   NiftiMeta* meta, int norm_mode) {
  uint8_t* raw = nullptr;
  size_t raw_len = 0;
  int rc = read_all(path, &raw, &raw_len);
  if (rc != NN_OK) return rc;

  uint8_t* data = raw;
  size_t data_len = raw_len;
  uint8_t* inflated = nullptr;
  bool gz = raw_len >= 2 && raw[0] == 0x1f && raw[1] == 0x8b;
  uint8_t hdr_buf[352];
  if (gz && dst == nullptr) {
    // metadata probe: inflate only the header, skip the voxel payload
    rc = gunzip_prefix(raw, raw_len, hdr_buf, sizeof(hdr_buf));
    free(raw);
    if (rc != NN_OK) return rc;
    data = hdr_buf;
    data_len = sizeof(hdr_buf);
    raw = nullptr;
  } else if (gz) {
    rc = gunzip(raw, raw_len, &inflated, &data_len);
    free(raw);
    raw = nullptr;
    if (rc != NN_OK) return rc;
    data = inflated;
  }

  bool heap = (data != hdr_buf);
  if (data_len < 352) {
    if (heap) free(data);
    return NN_EHDR;
  }
  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, data, 4);
  if (sizeof_hdr != 348) {  // big-endian files take the Python path
    if (heap) free(data);
    return NN_EHDR;
  }
  int16_t dim[8];
  memcpy(dim, data + 40, 16);
  int16_t datatype, bitpix;
  memcpy(&datatype, data + 70, 2);
  memcpy(&bitpix, data + 72, 2);
  float vox_offset, scl_slope, scl_inter;
  memcpy(&vox_offset, data + 108, 4);
  memcpy(&scl_slope, data + 112, 4);
  memcpy(&scl_inter, data + 116, 4);
  int16_t qform_code, sform_code;
  memcpy(&qform_code, data + 252, 2);
  memcpy(&sform_code, data + 254, 2);

  if (dim[0] < 3) {
    if (heap) free(data);
    return NN_EHDR;
  }
  int64_t nx = dim[1], ny = dim[2], nz = dim[3];
  int64_t n = nx * ny * nz;
  if (meta) {
    meta->dim[0] = nx;
    meta->dim[1] = ny;
    meta->dim[2] = nz;
    meta->datatype = datatype;
    meta->scl_slope = scl_slope;
    meta->scl_inter = scl_inter;
    meta->sform_code = sform_code;
    meta->qform_code = qform_code;
    float srow[12];
    memcpy(srow, data + 280, 48);
    for (int i = 0; i < 12; i++) meta->affine[i] = srow[i];
  }
  if (!dst) {
    if (heap) free(data);
    return (n <= 0) ? NN_EHDR : (int)NN_OK;  // metadata-only probe
  }
  if (dst_capacity < n) {
    if (heap) free(data);
    return NN_ESIZE;
  }

  // element size from DATATYPE, not the header's bitpix field: decode
  // reads sizeof(T) per voxel, so a malformed header with inconsistent
  // bitpix must not pass the bounds check (heap overread otherwise)
  size_t elem;
  switch (datatype) {
    case 2: case 256: elem = 1; break;             // u8 / i8
    case 4: case 512: elem = 2; break;             // i16 / u16
    case 8: case 16: elem = 4; break;              // i32 / f32
    case 64: elem = 8; break;                      // f64
    default:
      if (heap) free(data);
      return NN_EDTYPE;
  }
  size_t offset = (size_t)(vox_offset >= 352.0f ? vox_offset : 352.0f);
  if (offset > data_len || (size_t)n * elem > data_len - offset) {
    if (heap) free(data);
    return NN_EHDR;
  }
  const uint8_t* vox = data + offset;
  float slope = (scl_slope == 0.0f) ? 1.0f : scl_slope;
  float inter = (scl_slope == 0.0f && scl_inter == 0.0f) ? 0.0f : scl_inter;

  switch (datatype) {
    case 2:  // uint8
      decode_to_f32<uint8_t>(vox, dst, n, slope, inter);
      break;
    case 4:  // int16
      decode_to_f32<int16_t>(vox, dst, n, slope, inter);
      break;
    case 8:  // int32
      decode_to_f32<int32_t>(vox, dst, n, slope, inter);
      break;
    case 16:  // float32
      decode_to_f32<float>(vox, dst, n, slope, inter);
      break;
    case 64:  // float64
      decode_to_f32<double>(vox, dst, n, slope, inter);
      break;
    case 256:  // int8
      decode_to_f32<int8_t>(vox, dst, n, slope, inter);
      break;
    case 512:  // uint16
      decode_to_f32<uint16_t>(vox, dst, n, slope, inter);
      break;
    default:
      if (heap) free(data);
      return NN_EDTYPE;
  }
  if (heap) free(data);

  if (norm_mode == 1) {  // CT abdominal window (utils/dataloader.py:111-117)
    const float lo = -160.0f, hi = 240.0f, inv = 1.0f / (hi - lo);
    for (int64_t i = 0; i < n; i++) {
      float v = dst[i];
      v = v < lo ? lo : (v > hi ? hi : v);
      dst[i] = (v - lo) * inv;
    }
  }
  return NN_OK;
}

}  // extern "C"
