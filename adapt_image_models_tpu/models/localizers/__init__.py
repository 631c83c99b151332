from adapt_image_models_tpu.models.localizers.bmn import (
    BMN, soft_nms, generate_bmn_labels,
)
from adapt_image_models_tpu.models.localizers.bsn import (
    TEM, PEM, generate_tem_labels,
)
from adapt_image_models_tpu.models.localizers.ssn import SSN, ssn_test_post
