"""CLI entry points:

  python -m real_time_video_deepfake_detection_tpu.serving.server   # serve
  python -m real_time_video_deepfake_detection_tpu.train.trainer    # train
  python -m real_time_video_deepfake_detection_tpu.cli.analyze      # video/webcam
  python bench.py                                                   # benchmark
"""
