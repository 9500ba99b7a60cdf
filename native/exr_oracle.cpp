// TEST-ONLY oracle: encode/decode EXR via the SYSTEM OpenEXR library, used by
// the test suite to produce ground-truth PIZ/PXR24/RLE/ZIP files for
// validating our own independent codecs (utils/exr.py, native/idf_native.cpp).
// Never linked into the framework itself.
//
// Usage:
//   exr_oracle write <out.exr> <w> <h> <compression 0..5> <half 0|1>  (raw f32 RGBA on stdin)
//   exr_oracle writetiled <out.exr> <w> <h> <comp> <txs> <tys> <mip 0|1>  (raw f32 RGBA on stdin)
//   exr_oracle read  <in.exr>                                         (raw f32 RGBA on stdout)

#include <ImfRgbaFile.h>
#include <ImfOutputFile.h>
#include <ImfInputFile.h>
#include <ImfTiledOutputFile.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfArray.h>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using namespace Imf;
using namespace Imath;

int main(int argc, char** argv) {
  if (argc < 3) return 2;
  if (!std::strcmp(argv[1], "write")) {
    if (argc != 7) return 2;
    const char* path = argv[2];
    int w = std::atoi(argv[3]), h = std::atoi(argv[4]);
    int comp = std::atoi(argv[5]);
    int as_half = std::atoi(argv[6]);
    std::vector<float> buf(4ull * w * h);
    if (std::fread(buf.data(), 4, buf.size(), stdin) != buf.size()) return 3;
    if (as_half) {
      Array2D<Rgba> px(h, w);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
          const float* p = &buf[4ull * (y * (size_t)w + x)];
          px[y][x] = Rgba(p[0], p[1], p[2], p[3]);
        }
      RgbaOutputFile f(path, w, h, WRITE_RGBA, 1, V2f(0, 0), 1,
                       INCREASING_Y, (Compression)comp);
      f.setFrameBuffer(&px[0][0], 1, w);
      f.writePixels(h);
    } else {
      // FLOAT channels through the general API (exercises PIZ size=2 /
      // PXR24 float-truncation paths).
      Header hdr(w, h);
      hdr.compression() = (Compression)comp;
      const char* names[4] = {"R", "G", "B", "A"};
      FrameBuffer fb;
      for (int c = 0; c < 4; ++c) {
        hdr.channels().insert(names[c], Channel(Imf::FLOAT));
        fb.insert(names[c],
                  Slice(Imf::FLOAT, (char*)(buf.data() + c),
                        4 * sizeof(float), 4 * sizeof(float) * (size_t)w));
      }
      OutputFile f(path, hdr);
      f.setFrameBuffer(fb);
      f.writePixels(h);
    }
    return 0;
  }
  if (!std::strcmp(argv[1], "writetiled")) {
    // Tiled single-part image: mip = 0 ONE_LEVEL, 1 MIPMAP_LEVELS,
    // 2 RIPMAP_LEVELS. Level (0, 0) carries the stdin image; other levels
    // are decimated copies (our decoder reads only level (0, 0) -- the
    // full-resolution image, like tinyexr -- but must parse every level's
    // offset-table entries to find it).
    if (argc != 9) return 2;
    const char* path = argv[2];
    int w = std::atoi(argv[3]), h = std::atoi(argv[4]);
    int comp = std::atoi(argv[5]);
    int txs = std::atoi(argv[6]), tys = std::atoi(argv[7]);
    int mip = std::atoi(argv[8]);
    std::vector<float> buf(4ull * w * h);
    if (std::fread(buf.data(), 4, buf.size(), stdin) != buf.size()) return 3;
    Header hdr(w, h);
    hdr.compression() = (Compression)comp;
    LevelMode lm = mip == 2 ? RIPMAP_LEVELS : (mip ? MIPMAP_LEVELS : ONE_LEVEL);
    hdr.setTileDescription(TileDescription(txs, tys, lm, ROUND_DOWN));
    const char* names[4] = {"R", "G", "B", "A"};
    for (int c = 0; c < 4; ++c)
      hdr.channels().insert(names[c], Channel(Imf::FLOAT));
    TiledOutputFile f(path, hdr);
    for (int ly = 0; ly < f.numYLevels(); ++ly)
      for (int lx = 0; lx < f.numXLevels(); ++lx) {
        if (lm != RIPMAP_LEVELS && lx != ly) continue;  // diagonal only
        int lw = f.levelWidth(lx), lh = f.levelHeight(ly);
        std::vector<float> lbuf(4ull * lw * lh);
        int sx = w / lw, sy = h / lh;
        for (int y = 0; y < lh; ++y)
          for (int x = 0; x < lw; ++x)
            std::memcpy(&lbuf[4ull * (y * (size_t)lw + x)],
                        &buf[4ull * ((size_t)y * sy * w + (size_t)x * sx)],
                        4 * sizeof(float));
        FrameBuffer fb;
        for (int c = 0; c < 4; ++c)
          fb.insert(names[c],
                    Slice(Imf::FLOAT, (char*)(lbuf.data() + c),
                          4 * sizeof(float), 4 * sizeof(float) * (size_t)lw));
        f.setFrameBuffer(fb);
        f.writeTiles(0, f.numXTiles(lx) - 1, 0, f.numYTiles(ly) - 1, lx, ly);
      }
    return 0;
  }
  if (!std::strcmp(argv[1], "read")) {
    // General API with FLOAT slices: no intermediate half quantization, so
    // the output is the decoder's exact result.
    InputFile f(argv[2]);
    Box2i dw = f.header().dataWindow();
    int w = dw.max.x - dw.min.x + 1, h = dw.max.y - dw.min.y + 1;
    std::vector<float> buf(4ull * w * h, 0.f);
    for (size_t i = 0; i < (size_t)w * h; ++i) buf[4 * i + 3] = 1.f;
    const char* names[4] = {"R", "G", "B", "A"};
    FrameBuffer fb;
    for (int c = 0; c < 4; ++c) {
      if (f.header().channels().findChannel(names[c]))
        fb.insert(names[c],
                  Slice(Imf::FLOAT,
                        (char*)(buf.data() + c - 4ull * (dw.min.x + dw.min.y * (size_t)w)),
                        4 * sizeof(float), 4 * sizeof(float) * (size_t)w));
    }
    f.setFrameBuffer(fb);
    f.readPixels(dw.min.y, dw.max.y);
    std::fwrite(buf.data(), 4, buf.size(), stdout);
    return 0;
  }
  return 2;
}
