from .metrics import (
    qa_f1_score,
    qa_f1_zh_score,
    rouge_score,
    rouge_zh_score,
    classification_score,
    retrieval_score,
    retrieval_zh_score,
    count_score,
    code_sim_score,
    string_match_all,
    DATASET_METRICS,
)
from .tasks import LONGBENCH_TASKS, LONGBENCH_EN_TASKS, MODEL_MAX_LEN
from .harness import GenerationHarness, middle_truncate
