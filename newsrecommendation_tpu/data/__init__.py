from newsrecommendation_tpu.data.mind import (  # noqa: F401
    NewsCorpus,
    build_news_features,
    read_news,
    tokenize,
)
from newsrecommendation_tpu.data.prepare import (  # noqa: F401
    prepare_testing_data,
    prepare_training_data,
)
from newsrecommendation_tpu.data.loader import EvalSamples, TrainSamples  # noqa: F401
