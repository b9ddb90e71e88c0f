/* Test harness: encode a WAV with the REFERENCE library under encode
 * parameters the reference CLI cannot express (window types beyond
 * RECT/SIN, custom orders) so differential tests can pin byte-identity on
 * those API-only configurations.
 *
 * Build (conftest/tests do this on demand):
 *   gcc -std=c89 -O3 -DNDEBUG -o tools/sla_ref_custom tools/ref_custom.c \
 *       $(ls /root/reference/src/*.c | grep -v main.c) \
 *       -I/root/reference/src/include/public \
 *       -I/root/reference/src/include/private -lm
 *
 * Usage:
 *   sla_ref_custom WINDOW PARCOR LONGTERM LMS MS MAXBLOCK in.wav out.sla
 *   WINDOW: 0=rect 1=sin 2=hann 3=blackman 4=vorbis  MS: 0=none 1=stereo-MS
 */
#include <stdio.h>
#include <stdlib.h>
#include <sys/stat.h>

#include "SLAEncoder.h"
#include "wav.h"

int main(int argc, char** argv)
{
  struct WAVFile*           in_wav;
  struct stat               fstat;
  struct SLAEncoder*        encoder;
  struct SLAEncoderConfig   config;
  struct SLAEncodeParameter enc_param;
  struct SLAWaveFormat      wave_format;
  uint8_t*                  buffer;
  uint32_t                  buffer_size, encoded_data_size;
  FILE*                     out_fp;
  SLAApiResult              ret;

  if (argc != 9) {
    fprintf(stderr,
        "usage: %s WINDOW PARCOR LONGTERM LMS MS MAXBLOCK in.wav out.sla\n",
        argv[0]);
    return 2;
  }

  /* same capacity maxima as the reference CLI (main.c:94-99) */
  config.max_num_channels         = 8;
  config.max_num_block_samples    = 16384;
  config.max_parcor_order         = 48;
  config.max_longterm_order       = 5;
  config.max_lms_order_per_filter = 40;
  config.verpose_flag             = 0;
  if ((encoder = SLAEncoder_Create(&config)) == NULL) {
    fprintf(stderr, "create failed\n");
    return 1;
  }
  if ((in_wav = WAV_CreateFromFile(argv[7])) == NULL) {
    fprintf(stderr, "failed to open %s\n", argv[7]);
    return 1;
  }
  wave_format.num_channels   = in_wav->format.num_channels;
  wave_format.bit_per_sample = in_wav->format.bits_per_sample;
  wave_format.sampling_rate  = in_wav->format.sampling_rate;
  wave_format.offset_lshift  = 0;
  if ((ret = SLAEncoder_SetWaveFormat(encoder, &wave_format)) != SLA_APIRESULT_OK) {
    fprintf(stderr, "set wave format: %d\n", ret);
    return 1;
  }
  enc_param.window_function_type  = (SLAWindowFunctionType)atoi(argv[1]);
  enc_param.parcor_order          = (uint32_t)atoi(argv[2]);
  enc_param.longterm_order        = (uint32_t)atoi(argv[3]);
  enc_param.lms_order_per_filter  = (uint32_t)atoi(argv[4]);
  enc_param.ch_process_method
      = atoi(argv[5]) ? SLA_CHPROCESSMETHOD_STEREO_MS : SLA_CHPROCESSMETHOD_NONE;
  enc_param.max_num_block_samples = (uint32_t)atoi(argv[6]);
  if ((ret = SLAEncoder_SetEncodeParameter(encoder, &enc_param)) != SLA_APIRESULT_OK) {
    fprintf(stderr, "set encode parameter: %d\n", ret);
    return 1;
  }
  stat(argv[7], &fstat);
  buffer_size = (uint32_t)(2 * fstat.st_size);
  buffer = (uint8_t*)malloc(buffer_size);
  if ((ret = SLAEncoder_EncodeWhole(encoder,
          (const int32_t* const*)in_wav->data, in_wav->format.num_samples,
          buffer, buffer_size, &encoded_data_size)) != SLA_APIRESULT_OK) {
    fprintf(stderr, "encode: %d\n", ret);
    return 1;
  }
  out_fp = fopen(argv[8], "wb");
  fwrite(buffer, sizeof(uint8_t), encoded_data_size, out_fp);
  fclose(out_fp);
  free(buffer);
  WAV_Destroy(in_wav);
  SLAEncoder_Destroy(encoder);
  return 0;
}
