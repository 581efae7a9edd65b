/* Fixture generator + golden-coefficient dumper for the arithmetic
 * JPEG (T.81 Annex D/F) test suite. Dev-time tool only — compiled and
 * run against the system libjpeg (which implements arithmetic coding)
 * to produce the committed fixtures under src/test/resources/jpeg/:
 *
 *   gen enc <out.jpg> <gray|c444|c420> <quality> <restart_interval> <arith:0|1>
 *     64x48 deterministic pattern, sequential DCT, arithmetic- or
 *     huffman-coded.
 *   gen coef <in.jpg> <out.coef>
 *     dump quantized DCT coefficients (natural order) per component —
 *     the bit-exact golden the Scala decoder must reproduce.
 *   gen mean <in.jpg>
 *     decoded luma mean (for cross-checking the Scala encoder).
 *
 * cc -O2 -o gen gen.c -ljpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char px(int x, int y, int c) {
  /* deterministic, full-range pattern with diagonal structure */
  switch (c) {
    case 0: return (unsigned char)((x * 7 + y * 13 + (x * y) / 3) & 0xff);
    case 1: return (unsigned char)((x * 3 + y * 5) & 0xff);
    default: return (unsigned char)((x * 11 + y * 2 + 128) & 0xff);
  }
}

static void enc(const char *out, const char *mode, int quality,
                int restart, int arith) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(out, "wb");
  int W = 64, H = 48, gray = !strcmp(mode, "gray") || !strcmp(mode, "pgray");
  int y;
  if (!f) { perror(out); exit(1); }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = W;
  cinfo.image_height = H;
  cinfo.input_components = gray ? 1 : 3;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart;
  if (!gray && (!strcmp(mode, "c444") || !strcmp(mode, "p444"))) {
    cinfo.comp_info[0].h_samp_factor = 1;
    cinfo.comp_info[0].v_samp_factor = 1;
  } /* c420 keeps the 2x2,1x1,1x1 default */
  if (mode[0] == 'p' || !strcmp(mode, "pgray"))
    jpeg_simple_progression(&cinfo); /* progressive scan script */
  jpeg_start_compress(&cinfo, TRUE);
  for (y = 0; y < H; y++) {
    unsigned char row[64 * 3];
    int x;
    for (x = 0; x < W; x++) {
      if (gray) row[x] = px(x, y, 0);
      else { row[3*x] = px(x, y, 0); row[3*x+1] = px(x, y, 1); row[3*x+2] = px(x, y, 2); }
    }
    { JSAMPROW r = row; jpeg_write_scanlines(&cinfo, &r, 1); }
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
}

static void coef(const char *in, const char *out) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb"), *fo = fopen(out, "w");
  jvirt_barray_ptr *arrays;
  int ci;
  if (!fi || !fo) { perror("open"); exit(1); }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fi);
  jpeg_read_header(&cinfo, TRUE);
  arrays = jpeg_read_coefficients(&cinfo);
  fprintf(fo, "%d\n", cinfo.num_components);
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    JDIMENSION by, bx;
    fprintf(fo, "%d %u %u\n", ci, comp->width_in_blocks, comp->height_in_blocks);
    for (by = 0; by < comp->height_in_blocks; by++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)
        ((j_common_ptr)&cinfo, arrays[ci], by, 1, FALSE);
      for (bx = 0; bx < comp->width_in_blocks; bx++) {
        int k;
        for (k = 0; k < 64; k++)
          fprintf(fo, "%d%c", rows[0][bx][k], k == 63 ? '\n' : ' ');
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fi); fclose(fo);
}

static void mean(const char *in) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *fi = fopen(in, "rb");
  double sum = 0; long cnt = 0;
  if (!fi) { perror(in); exit(1); }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fi);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char row[8192]; JSAMPROW r = row; JDIMENSION x;
    jpeg_read_scanlines(&cinfo, &r, 1);
    for (x = 0; x < cinfo.output_width; x++) { sum += row[x]; cnt++; }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fi);
  printf("%.6f %ld\n", sum / cnt, cnt);
}

int main(int argc, char **argv) {
  if (argc >= 7 && !strcmp(argv[1], "enc"))
    enc(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]), atoi(argv[6]));
  else if (argc >= 4 && !strcmp(argv[1], "coef"))
    coef(argv[2], argv[3]);
  else if (argc >= 3 && !strcmp(argv[1], "mean"))
    mean(argv[2]);
  else { fprintf(stderr, "usage: see header\n"); return 2; }
  return 0;
}
