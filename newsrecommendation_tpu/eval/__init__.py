from newsrecommendation_tpu.eval.pipeline import (  # noqa: F401
    combine_metric_sums,
    compute_news_scoring,
    cross_process_sum,
    doc_sim_probe,
    evaluate_impressions,
    summarize_metric_sums,
)
