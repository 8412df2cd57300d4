/* Test-only parity oracle: a tiny CLI over the system libjpeg used to
 * cross-check the clean-room arithmetic-coded JPEG implementation in
 * hortacloud_importer_spark/sources/jpeg_arith.py. Compiled on demand
 * by tests/jpeg_ref.py; the engine itself never uses this.
 *
 * Usage:
 *   jpegref decode <in.jpg> <out.raw>
 *       out.raw = "w h ncomp\n" header then w*h*ncomp raw bytes
 *       (JCS_GRAYSCALE for 1 comp, JCS_RGB otherwise)
 *   jpegref encode <in.raw> <out.jpg> <quality> <arith:0|1> <prog:0|1>
 *           <h_samp> <v_samp> [restart_interval]
 *       in.raw in the same header+bytes format
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <setjmp.h>
#include <jpeglib.h>

struct err_mgr { struct jpeg_error_mgr pub; jmp_buf jb; };

static void err_exit(j_common_ptr cinfo) {
  struct err_mgr *e = (struct err_mgr *)cinfo->err;
  (*cinfo->err->output_message)(cinfo);
  longjmp(e->jb, 1);
}

static int do_decode(const char *in, const char *out) {
  FILE *f = fopen(in, "rb");
  if (!f) { perror("in"); return 2; }
  struct jpeg_decompress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_decompress(&cinfo); fclose(f); return 3; }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.num_components == 1) cinfo.out_color_space = JCS_GRAYSCALE;
  else cinfo.out_color_space = JCS_RGB;
  /* disable smart upsampling so chroma replication matches the
   * nearest-neighbour convention of the clean-room decoder */
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      nc = cinfo.output_components;
  FILE *g = fopen(out, "wb");
  if (!g) { perror("out"); return 2; }
  fprintf(g, "%d %d %d\n", w, h, nc);
  JSAMPROW row = malloc((size_t)w * nc);
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, &row, 1);
    fwrite(row, 1, (size_t)w * nc, g);
  }
  free(row);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f); fclose(g);
  return 0;
}

static int do_encode(const char *in, const char *out, int quality,
                     int arith, int prog, int hs, int vs, int ri) {
  FILE *f = fopen(in, "rb");
  if (!f) { perror("in"); return 2; }
  int w, h, nc;
  if (fscanf(f, "%d %d %d\n", &w, &h, &nc) != 3) { fclose(f); return 2; }
  size_t n = (size_t)w * h * nc;
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != n) { fclose(f); return 2; }
  fclose(f);

  struct jpeg_compress_struct cinfo;
  struct err_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) { jpeg_destroy_compress(&cinfo); return 3; }
  jpeg_create_compress(&cinfo);
  FILE *g = fopen(out, "wb");
  if (!g) { perror("out"); return 2; }
  jpeg_stdio_dest(&cinfo, g);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  if (prog == 1) jpeg_simple_progression(&cinfo);
  else if (prog == 2 && nc > 1) {
    /* non-interleaved sequential: one full scan per component */
    static jpeg_scan_info scans[4];
    int ci;
    for (ci = 0; ci < nc; ci++) {
      scans[ci].comps_in_scan = 1;
      scans[ci].component_index[0] = ci;
      scans[ci].Ss = 0; scans[ci].Se = 63;
      scans[ci].Ah = 0; scans[ci].Al = 0;
    }
    cinfo.scan_info = scans;
    cinfo.num_scans = nc;
  }
  if (nc > 1) {
    cinfo.comp_info[0].h_samp_factor = hs;
    cinfo.comp_info[0].v_samp_factor = vs;
  }
  cinfo.restart_interval = ri;
  jpeg_start_compress(&cinfo, TRUE);
  JSAMPROW row;
  while (cinfo.next_scanline < cinfo.image_height) {
    row = buf + (size_t)cinfo.next_scanline * w * nc;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(g); free(buf);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 4 && !strcmp(argv[1], "decode"))
    return do_decode(argv[2], argv[3]);
  if (argc >= 9 && !strcmp(argv[1], "encode"))
    return do_encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                     atoi(argv[6]), atoi(argv[7]), atoi(argv[8]),
                     argc > 9 ? atoi(argv[9]) : 0);
  fprintf(stderr, "usage: jpegref decode in.jpg out.raw | jpegref encode "
                  "in.raw out.jpg q arith prog hs vs [ri]\n");
  return 1;
}
