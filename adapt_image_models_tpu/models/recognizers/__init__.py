from adapt_image_models_tpu.models.recognizers.recognizer3d import (
    Recognizer3D, average_clip,
)
from adapt_image_models_tpu.models.recognizers.recognizer2d import Recognizer2D
from adapt_image_models_tpu.models.recognizers.audio_recognizer import (
    AudioRecognizer, AudioTSNHead,
)
