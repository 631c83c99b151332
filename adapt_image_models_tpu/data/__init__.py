from adapt_image_models_tpu.data.sampling import (
    sample_frames, SampleFrames, DenseSampleFrames, UntrimmedSampleFrames,
)
from adapt_image_models_tpu.data.video_reader import (
    VideoReader, OpenCVVideoReader, RawFrameReader, SyntheticVideoReader,
    open_video,
)
from adapt_image_models_tpu.data.datasets import (
    VideoDataset, RawframeDataset, build_dataset, DATASETS,
)
from adapt_image_models_tpu.data.pipeline import (
    build_sample_processor, SampleProcessor,
)
from adapt_image_models_tpu.data.loader import VideoLoader
import adapt_image_models_tpu.data.ava_dataset  # noqa: F401  (register)
import adapt_image_models_tpu.data.ssn_dataset  # noqa: F401  (register)
import adapt_image_models_tpu.data.activitynet  # noqa: F401  (register)
import adapt_image_models_tpu.data.hvu_dataset  # noqa: F401  (register)
import adapt_image_models_tpu.data.pose_dataset  # noqa: F401  (register)
