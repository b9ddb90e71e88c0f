/* Differential-test harness around the reference entropy coder.
 *
 * stdin:  u32 num_channels, u32 num_samples, u32 bitwidth,
 *         then num_channels * num_samples int32 (channel-major)
 * stdout: u32 payload_size, then the bytes produced by
 *         PutInitialRecursiveRiceParameter + PutDataArray (byte-aligned)
 *
 * Links against the reference sources (read-only); used only by tests.
 */
#include <stdio.h>
#include <stdlib.h>
#include "SLACoder.h"
#include "SLABitStream.h"
#include "SLAInternal.h"

int main(void) {
  uint32_t nch, ns, bw, ch;
  struct SLABitStream strm;
  struct SLACoder* coder;
  int32_t** data;
  uint8_t* buf;
  int32_t size;
  if (fread(&nch, 4, 1, stdin) != 1) return 1;
  if (fread(&ns, 4, 1, stdin) != 1) return 1;
  if (fread(&bw, 4, 1, stdin) != 1) return 1;
  data = malloc(sizeof(int32_t*) * nch);
  for (ch = 0; ch < nch; ch++) {
    data[ch] = malloc(sizeof(int32_t) * ns);
    if (fread(data[ch], 4, ns, stdin) != ns) return 1;
  }
  buf = malloc(16u * nch * ns + 1024);
  coder = SLACoder_Create(nch, SLACODER_NUM_RECURSIVERICE_PARAMETER);
  SLACoder_CalculateInitialRecursiveRiceParameter(
      coder, SLACODER_NUM_RECURSIVERICE_PARAMETER,
      (const int32_t**)data, nch, ns);
  SLABitWriter_Open(&strm, buf, 16u * nch * ns + 1024);
  for (ch = 0; ch < nch; ch++) {
    SLACoder_PutInitialRecursiveRiceParameter(
        coder, &strm, SLACODER_NUM_RECURSIVERICE_PARAMETER, bw, ch);
  }
  SLABitStream_Flush(&strm);
  SLACoder_PutDataArray(coder, &strm, SLACODER_NUM_RECURSIVERICE_PARAMETER,
                        (const int32_t**)data, nch, ns);
  SLABitStream_Flush(&strm);
  SLABitStream_Tell(&strm, &size);
  fwrite(&size, 4, 1, stdout);
  fwrite(buf, 1, (size_t)size, stdout);
  return 0;
}
