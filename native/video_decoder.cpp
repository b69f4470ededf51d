// Native video decoder: FFmpeg demux/decode + swscale resize-at-decode.
//
// TPU-native replacement for the reference's decord C++ VideoReader
// (utils/funcs.py:153: decode + resize at decode time, stride sampling).
// Exposed as a C API consumed from Python via ctypes (geo4d_tpu/data/video.py)
// so full-resolution frames never enter Python: frames are decoded,
// stride-sampled, scaled to the target eval resolution and written straight
// into a caller-provided contiguous RGB24 buffer ready for device upload.
//
// Build: see native/build.sh (cc -shared against libavformat/avcodec/swscale).

#include <cstdint>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
  int stream_idx = -1;
  int out_w = 0, out_h = 0;
  double fps = 0.0;
  uint8_t* rgb_buf = nullptr;
};

void destroy(Decoder* d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->rgb) av_frame_free(&d->rgb);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  if (d->rgb_buf) av_free(d->rgb_buf);
  delete d;
}

}  // namespace

extern "C" {

// Open a video; returns an opaque handle or null.
void* vd_open(const char* path, int out_w, int out_h) {
  auto* d = new Decoder();
  d->out_w = out_w;
  d->out_h = out_h;
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_idx =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_idx < 0 || !dec) {
    destroy(d);
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_idx];
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = 0;  // auto
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->fps = r.den ? av_q2d(r) : 24.0;

  d->frame = av_frame_alloc();
  d->rgb = av_frame_alloc();
  d->pkt = av_packet_alloc();
  int rgb_size = av_image_get_buffer_size(AV_PIX_FMT_RGB24, out_w, out_h, 32);
  d->rgb_buf = static_cast<uint8_t*>(av_malloc(rgb_size));
  av_image_fill_arrays(d->rgb->data, d->rgb->linesize, d->rgb_buf,
                       AV_PIX_FMT_RGB24, out_w, out_h, 32);
  return d;
}

double vd_fps(void* handle) { return static_cast<Decoder*>(handle)->fps; }

// Decode up to `max_frames` stride-sampled frames into `out`
// (max_frames * out_h * out_w * 3, RGB24, row-contiguous). Returns the
// number of frames written.
int vd_read_frames(void* handle, uint8_t* out, int max_frames, int stride) {
  auto* d = static_cast<Decoder*>(handle);
  const int frame_bytes = d->out_w * d->out_h * 3;
  int written = 0;
  int64_t seen = 0;

  auto emit = [&](AVFrame* f) -> bool {
    if (seen++ % stride != 0) return true;
    if (!d->sws) {
      d->sws = sws_getContext(f->width, f->height,
                              static_cast<AVPixelFormat>(f->format), d->out_w,
                              d->out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                              nullptr, nullptr, nullptr);
    }
    sws_scale(d->sws, f->data, f->linesize, 0, f->height, d->rgb->data,
              d->rgb->linesize);
    uint8_t* dst = out + static_cast<int64_t>(written) * frame_bytes;
    // de-stride the swscale output (linesize may be padded to 32)
    for (int y = 0; y < d->out_h; ++y) {
      std::memcpy(dst + y * d->out_w * 3, d->rgb->data[0] + y * d->rgb->linesize[0],
                  d->out_w * 3);
    }
    ++written;
    return written < max_frames;
  };

  while (av_read_frame(d->fmt, d->pkt) >= 0) {
    if (d->pkt->stream_index == d->stream_idx) {
      if (avcodec_send_packet(d->codec, d->pkt) >= 0) {
        while (avcodec_receive_frame(d->codec, d->frame) >= 0) {
          if (!emit(d->frame)) {
            av_packet_unref(d->pkt);
            return written;
          }
        }
      }
    }
    av_packet_unref(d->pkt);
  }
  // flush
  avcodec_send_packet(d->codec, nullptr);
  while (avcodec_receive_frame(d->codec, d->frame) >= 0) {
    if (!emit(d->frame)) return written;
  }
  return written;
}

void vd_close(void* handle) { destroy(static_cast<Decoder*>(handle)); }

}  // extern "C"
