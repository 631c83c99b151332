// aimmv — motion-vector extraction from inter-coded video.
//
// TPU-native replacement for the reference's PyAV motion-vector decode
// (``PyAVDecodeMotionVector``, loading.py:851-928): opens the codec with
// +export_mvs, decodes sequentially, and paints each motion vector's
// (dx, dy) over its block into a dense (H, W, 2) int8 map — exactly the
// reference's _parse_vectors semantics (vectors fully inside the frame
// only; later vectors overwrite earlier ones; key frames stay zero).
//
// C API (ctypes, see adapt_image_models_tpu/data/cpp_decoder.py):
//   void* aim_open_mv(const char* path);
//   long  aim_mv_num_frames(void* h);
//   int   aim_mv_frame_size(void* h, int* height, int* width);
//   int   aim_get_motion_vectors(void* h, const long* indices, int n,
//                                int8_t* out);  // out: (n, H, W, 2)
//   void  aim_close_mv(void* h);

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/motion_vector.h>
#include <libavutil/opt.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_mv_error;
void set_mverror(const std::string& m) { g_mv_error = m; }

struct MvReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;
  int height = 0, width = 0;
  ~MvReader() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
  }
};

void paint(const AVFrameSideData* sd, int height, int width, int8_t* dst) {
  const AVMotionVector* mvs = (const AVMotionVector*)sd->data;
  size_t n = sd->size / sizeof(AVMotionVector);
  for (size_t i = 0; i < n; ++i) {
    const AVMotionVector& v = mvs[i];
    int dx = (int)(v.dst_x - v.src_x);
    int dy = (int)(v.dst_y - v.src_y);
    int sx = (int)v.dst_x - v.w / 2;
    int sy = (int)v.dst_y - v.h / 2;
    int ex = sx + v.w, ey = sy + v.h;
    // strict end bound (ex >= width drops edge-touching blocks): exactly
    // the reference's _parse_vectors condition `ex < width and ey < height`
    // (PyAVDecodeMotionVector, loading.py:880)
    if (sx < 0 || ex >= width || sy < 0 || ey >= height) continue;
    int8_t cx = (int8_t)std::clamp(dx, -128, 127);
    int8_t cy = (int8_t)std::clamp(dy, -128, 127);
    for (int y = sy; y < ey; ++y) {
      int8_t* row = dst + ((size_t)y * width + sx) * 2;
      for (int x = 0; x < ex - sx; ++x) {
        row[2 * x] = cx;
        row[2 * x + 1] = cy;
      }
    }
  }
}

}  // namespace

extern "C" {

const char* aim_mv_last_error() { return g_mv_error.c_str(); }

void* aim_open_mv(const char* path) {
  auto r = new MvReader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0 ||
      avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_mverror(std::string("cannot open ") + path);
    delete r;
    return nullptr;
  }
  r->stream_index = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                        nullptr, 0);
  if (r->stream_index < 0) {
    set_mverror("no video stream");
    delete r;
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  r->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(r->codec, st->codecpar);
  AVDictionary* opts = nullptr;
  av_dict_set(&opts, "flags2", "+export_mvs", 0);
  if (avcodec_open2(r->codec, dec, &opts) < 0) {
    av_dict_free(&opts);
    set_mverror("cannot open codec with export_mvs");
    delete r;
    return nullptr;
  }
  av_dict_free(&opts);
  r->width = r->codec->width;
  r->height = r->codec->height;
  r->num_frames = st->nb_frames;
  if (r->num_frames <= 0 && st->avg_frame_rate.num > 0 &&
      r->fmt->duration > 0) {
    r->num_frames = (int64_t)(r->fmt->duration / (double)AV_TIME_BASE *
                              av_q2d(st->avg_frame_rate) + 0.5);
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

long aim_mv_num_frames(void* h) { return ((MvReader*)h)->num_frames; }

int aim_mv_frame_size(void* h, int* height, int* width) {
  auto r = (MvReader*)h;
  *height = r->height;
  *width = r->width;
  return 0;
}

int aim_get_motion_vectors(void* h, const long* indices, int n,
                           int8_t* out) {
  auto r = (MvReader*)h;
  size_t frame_elems = (size_t)r->height * r->width * 2;
  std::memset(out, 0, (size_t)n * frame_elems);
  int64_t max_idx = 0;
  for (int i = 0; i < n; ++i) max_idx = std::max<int64_t>(max_idx, indices[i]);

  // sequential decode from the start (MV chains need full decode anyway,
  // matching the reference's demux-from-0 loop)
  av_seek_frame(r->fmt, r->stream_index, 0,
                AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE);
  avcodec_flush_buffers(r->codec);
  int64_t idx = 0;
  bool eof = false;
  while (!eof && idx <= max_idx) {
    int ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      avcodec_send_packet(r->codec, nullptr);
      eof = true;
    } else if (r->pkt->stream_index != r->stream_index) {
      av_packet_unref(r->pkt);
      continue;
    } else {
      avcodec_send_packet(r->codec, r->pkt);
      av_packet_unref(r->pkt);
    }
    while (avcodec_receive_frame(r->codec, r->frame) == 0) {
      const AVFrameSideData* sd = av_frame_get_side_data(
          r->frame, AV_FRAME_DATA_MOTION_VECTORS);
      if (sd) {
        for (int i = 0; i < n; ++i) {
          if (indices[i] == idx) paint(sd, r->height, r->width,
                                       out + (size_t)i * frame_elems);
        }
      }
      ++idx;
    }
  }
  return 0;
}

void aim_close_mv(void* h) { delete (MvReader*)h; }

}  // extern "C"
