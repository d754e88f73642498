/* Minimal self-contained CBLAS subset backing the reference C build for the
   golden-parity tests.  Plain-loop implementations; double precision only
   (the reference defaults real_t to double when USE_FLOAT is not defined).
   Signatures match the fallback prototypes in poismf.h (enums passed as
   ints -- ABI-identical). */

#include <math.h>

double cblas_ddot(const int n, const double *x, const int incx,
                  const double *y, const int incy) {
    double acc = 0.0;
    for (int i = 0; i < n; i++) acc += x[i * incx] * y[i * incy];
    return acc;
}

void cblas_daxpy(const int n, const double alpha, const double *x,
                 const int incx, double *y, const int incy) {
    for (int i = 0; i < n; i++) y[i * incy] += alpha * x[i * incx];
}

void cblas_dscal(const int n, const double alpha, double *x, const int incx) {
    for (int i = 0; i < n; i++) x[i * incx] *= alpha;
}

double cblas_dnrm2(const int n, const double *x, const int incx) {
    double acc = 0.0;
    for (int i = 0; i < n; i++) acc += x[i * incx] * x[i * incx];
    return sqrt(acc);
}

/* order: 101 = RowMajor; trans: 111 = NoTrans, 112 = Trans */
void cblas_dgemv(const int order, const int trans, const int m, const int n,
                 const double alpha, const double *a, const int lda,
                 const double *x, const int incx, const double beta,
                 double *y, const int incy) {
    if (order != 101) return; /* only RowMajor is used by the reference */
    if (trans == 111) {
        for (int i = 0; i < m; i++) {
            double acc = 0.0;
            for (int j = 0; j < n; j++) acc += a[i * lda + j] * x[j * incx];
            y[i * incy] = alpha * acc + beta * y[i * incy];
        }
    } else {
        for (int j = 0; j < n; j++) y[j * incy] *= beta;
        for (int i = 0; i < m; i++) {
            const double s = alpha * x[i * incx];
            for (int j = 0; j < n; j++) y[j * incy] += s * a[i * lda + j];
        }
    }
}
