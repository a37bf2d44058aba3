"""Dataset acquisition & preparation CLIs (reference components C11 + the
face-crop pre-extraction stage of C10):

  python -m real_time_video_deepfake_detection_tpu.data_tools.dfdc_download
  python -m real_time_video_deepfake_detection_tpu.data_tools.dfdc_process --zip ...
  python -m real_time_video_deepfake_detection_tpu.data_tools.face_extract --videos ...
"""
