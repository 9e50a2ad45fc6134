/* Minimal TH shim so the REFERENCE's my_lib.c (PyTorch-0.2 TH CPU ops,
 * /root/reference/my_package/src/my_lib.c) compiles standalone as a golden
 * oracle for parity tests.  The reference source is compiled IN PLACE from
 * the read-only checkout — nothing is copied into this repo; this header
 * only supplies the two TH symbols it actually uses: the THFloatTensor
 * struct fields (size/stride arrays, contiguous float data) and
 * THFloatTensor_data().
 */
#ifndef TH_SHIM_H
#define TH_SHIM_H

typedef struct THFloatTensor {
  long size[8];
  long stride[8];
  float *data;
} THFloatTensor;

static inline float *THFloatTensor_data(THFloatTensor *t) { return t->data; }

#endif /* TH_SHIM_H */
