from newsrecommendation_tpu.eval.pipeline import (  # noqa: F401
    compute_news_scoring,
    doc_sim_probe,
    evaluate_impressions,
)
