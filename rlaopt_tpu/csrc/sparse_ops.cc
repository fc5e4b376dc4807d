// Native CPU sparse kernels for rlaopt_tpu, registered as XLA FFI custom
// calls.
//
// TPU-native equivalent of the reference's C++/CUDA extension
// (rlaopt/csrc: csc_matvec.cpp, csc_matmat.cpp, row_slice.cpp + .cu
// counterparts; SURVEY §2.2 N1-N9). Differences by design:
//  * registration is XLA-FFI (jax.ffi) instead of TORCH_LIBRARY dispatch
//    keys — the handlers run on the XLA:CPU backend;
//  * the accelerator (TPU) path is NOT a port of the CUDA atomics kernels:
//    TPU has no atomics, so the device formulation lives in Python as
//    segment-sum / scatter-add XLA ops (rlaopt_tpu/sparse/ops.py); these
//    C++ kernels are the host-backend parity implementation with OpenMP
//    parallelism (reference parallelizes csc_matmat over RHS columns the
//    same way, csc_matmat.cpp:19);
//  * CSR kernels are implemented natively too (the reference routes CSR
//    through torch builtins).
//
// Build: see rlaopt_tpu/sparse/native.py (g++ -O3 -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

// ---------------------------------------------------------------------------
// Typed cores
// ---------------------------------------------------------------------------

template <typename T, typename I>
void csc_matvec_core(const T* values, const I* col_ptr, const I* row_idx,
                     const T* x, T* y, int64_t n_rows, int64_t n_cols) {
  std::memset(y, 0, sizeof(T) * n_rows);
  // Scatter-accumulate per column; serial (write races across columns).
  for (int64_t c = 0; c < n_cols; ++c) {
    const T xc = x[c];
    if (xc == T(0)) continue;
    for (I k = col_ptr[c]; k < col_ptr[c + 1]; ++k) {
      y[row_idx[k]] += values[k] * xc;
    }
  }
}

template <typename T, typename I>
void csc_matmat_core(const T* values, const I* col_ptr, const I* row_idx,
                     const T* X, T* Y, int64_t n_rows, int64_t n_cols,
                     int64_t n_rhs) {
  std::memset(Y, 0, sizeof(T) * n_rows * n_rhs);
  // Race-free parallelism over RHS columns (reference: OpenMP over batch).
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t j = 0; j < n_rhs; ++j) {
    for (int64_t c = 0; c < n_cols; ++c) {
      const T xc = X[c * n_rhs + j];
      if (xc == T(0)) continue;
      for (I k = col_ptr[c]; k < col_ptr[c + 1]; ++k) {
        Y[static_cast<int64_t>(row_idx[k]) * n_rhs + j] += values[k] * xc;
      }
    }
  }
}

template <typename T, typename I>
void csr_matvec_core(const T* values, const I* row_ptr, const I* col_idx,
                     const T* x, T* y, int64_t n_rows) {
  // Gather per row; embarrassingly parallel.
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t r = 0; r < n_rows; ++r) {
    T acc = T(0);
    for (I k = row_ptr[r]; k < row_ptr[r + 1]; ++k) {
      acc += values[k] * x[col_idx[k]];
    }
    y[r] = acc;
  }
}

template <typename T, typename I>
void csr_matmat_core(const T* values, const I* row_ptr, const I* col_idx,
                     const T* X, T* Y, int64_t n_rows, int64_t n_rhs) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t r = 0; r < n_rows; ++r) {
    T* out_row = Y + r * n_rhs;
    std::memset(out_row, 0, sizeof(T) * n_rhs);
    for (I k = row_ptr[r]; k < row_ptr[r + 1]; ++k) {
      const T v = values[k];
      const T* x_row = X + static_cast<int64_t>(col_idx[k]) * n_rhs;
      for (int64_t j = 0; j < n_rhs; ++j) {
        out_row[j] += v * x_row[j];
      }
    }
  }
}

template <typename T, typename I>
void gather_rows_core(const T* values, const I* col_idx, const I* row_ptr,
                      const I* sel, const I* new_row_ptr, T* out_values,
                      I* out_cols, int64_t n_sel) {
  // new_row_ptr precomputed host-side (prefix sum of selected row nnz).
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n_sel; ++i) {
    const I r = sel[i];
    const I src = row_ptr[r];
    const I dst = new_row_ptr[i];
    const I cnt = row_ptr[r + 1] - src;
    std::memcpy(out_values + dst, values + src, sizeof(T) * cnt);
    std::memcpy(out_cols + dst, col_idx + src, sizeof(I) * cnt);
  }
}

// ---------------------------------------------------------------------------
// Dtype dispatch helpers
// ---------------------------------------------------------------------------

bool is_f32(const ffi::AnyBuffer& b) {
  return b.element_type() == ffi::DataType::F32;
}
bool is_f64(const ffi::AnyBuffer& b) {
  return b.element_type() == ffi::DataType::F64;
}
bool is_i32(const ffi::AnyBuffer& b) {
  return b.element_type() == ffi::DataType::S32;
}
bool is_i64(const ffi::AnyBuffer& b) {
  return b.element_type() == ffi::DataType::S64;
}

#define DISPATCH_TI(values, indices, CALL)                                   \
  do {                                                                       \
    if (is_f32(values) && is_i32(indices)) {                                 \
      using T = float;                                                       \
      using I = int32_t;                                                     \
      CALL;                                                                  \
    } else if (is_f32(values) && is_i64(indices)) {                          \
      using T = float;                                                       \
      using I = int64_t;                                                     \
      CALL;                                                                  \
    } else if (is_f64(values) && is_i32(indices)) {                          \
      using T = double;                                                      \
      using I = int32_t;                                                     \
      CALL;                                                                  \
    } else if (is_f64(values) && is_i64(indices)) {                          \
      using T = double;                                                      \
      using I = int64_t;                                                     \
      CALL;                                                                  \
    } else {                                                                 \
      return ffi::Error::InvalidArgument(                                    \
          "unsupported dtype combination (want f32/f64 values, "             \
          "i32/i64 indices)");                                               \
    }                                                                        \
  } while (0)

template <typename T>
const T* data_as(const ffi::AnyBuffer& b) {
  return reinterpret_cast<const T*>(b.untyped_data());
}
template <typename T>
T* data_as(ffi::AnyBuffer* b) {
  return reinterpret_cast<T*>(b->untyped_data());
}

// ---------------------------------------------------------------------------
// FFI handlers
// ---------------------------------------------------------------------------

ffi::Error CscMatvec(ffi::AnyBuffer values, ffi::AnyBuffer col_ptr,
                     ffi::AnyBuffer row_idx, ffi::AnyBuffer x,
                     ffi::Result<ffi::AnyBuffer> y) {
  const int64_t n_cols = col_ptr.element_count() - 1;
  const int64_t n_rows = y->element_count();
  DISPATCH_TI(values, col_ptr,
              (csc_matvec_core<T, I>(
                  data_as<T>(values), data_as<I>(col_ptr), data_as<I>(row_idx),
                  data_as<T>(x), data_as<T>(&*y), n_rows, n_cols)));
  return ffi::Error::Success();
}

ffi::Error CscMatmat(ffi::AnyBuffer values, ffi::AnyBuffer col_ptr,
                     ffi::AnyBuffer row_idx, ffi::AnyBuffer X,
                     ffi::Result<ffi::AnyBuffer> Y) {
  const int64_t n_cols = col_ptr.element_count() - 1;
  auto y_dims = Y->dimensions();
  const int64_t n_rows = y_dims[0];
  const int64_t n_rhs = y_dims[1];
  DISPATCH_TI(values, col_ptr,
              (csc_matmat_core<T, I>(
                  data_as<T>(values), data_as<I>(col_ptr), data_as<I>(row_idx),
                  data_as<T>(X), data_as<T>(&*Y), n_rows, n_cols, n_rhs)));
  return ffi::Error::Success();
}

ffi::Error CsrMatvec(ffi::AnyBuffer values, ffi::AnyBuffer row_ptr,
                     ffi::AnyBuffer col_idx, ffi::AnyBuffer x,
                     ffi::Result<ffi::AnyBuffer> y) {
  const int64_t n_rows = y->element_count();
  DISPATCH_TI(values, row_ptr,
              (csr_matvec_core<T, I>(
                  data_as<T>(values), data_as<I>(row_ptr), data_as<I>(col_idx),
                  data_as<T>(x), data_as<T>(&*y), n_rows)));
  return ffi::Error::Success();
}

ffi::Error CsrMatmat(ffi::AnyBuffer values, ffi::AnyBuffer row_ptr,
                     ffi::AnyBuffer col_idx, ffi::AnyBuffer X,
                     ffi::Result<ffi::AnyBuffer> Y) {
  auto y_dims = Y->dimensions();
  const int64_t n_rows = y_dims[0];
  const int64_t n_rhs = y_dims[1];
  DISPATCH_TI(values, row_ptr,
              (csr_matmat_core<T, I>(
                  data_as<T>(values), data_as<I>(row_ptr), data_as<I>(col_idx),
                  data_as<T>(X), data_as<T>(&*Y), n_rows, n_rhs)));
  return ffi::Error::Success();
}

ffi::Error GatherRows(ffi::AnyBuffer values, ffi::AnyBuffer col_idx,
                      ffi::AnyBuffer row_ptr, ffi::AnyBuffer sel,
                      ffi::AnyBuffer new_row_ptr,
                      ffi::Result<ffi::AnyBuffer> out_values,
                      ffi::Result<ffi::AnyBuffer> out_cols) {
  const int64_t n_sel = sel.element_count();
  DISPATCH_TI(values, row_ptr,
              (gather_rows_core<T, I>(
                  data_as<T>(values), data_as<I>(col_idx), data_as<I>(row_ptr),
                  data_as<I>(sel), data_as<I>(new_row_ptr),
                  data_as<T>(&*out_values), data_as<I>(&*out_cols), n_sel)));
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(kCscMatvec, CscMatvec,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(kCscMatmat, CscMatmat,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(kCsrMatvec, CsrMatvec,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(kCsrMatmat, CsrMatmat,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(kGatherRows, GatherRows,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Arg<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>()
                                  .Ret<ffi::AnyBuffer>());

// C entry points for ctypes (each returns the XLA_FFI handler pointer).
extern "C" {
XLA_FFI_Error* RlaoptCscMatvec(XLA_FFI_CallFrame* frame) {
  return kCscMatvec(frame);
}
XLA_FFI_Error* RlaoptCscMatmat(XLA_FFI_CallFrame* frame) {
  return kCscMatmat(frame);
}
XLA_FFI_Error* RlaoptCsrMatvec(XLA_FFI_CallFrame* frame) {
  return kCsrMatvec(frame);
}
XLA_FFI_Error* RlaoptCsrMatmat(XLA_FFI_CallFrame* frame) {
  return kCsrMatmat(frame);
}
XLA_FFI_Error* RlaoptGatherRows(XLA_FFI_CallFrame* frame) {
  return kGatherRows(frame);
}
}
