from .metrics import (AccF1Metric, MultiLabelAccF1, CCCMetric, ccc, cccva,
                      acc_f1_score, composite_scores)

__all__ = ["AccF1Metric", "MultiLabelAccF1", "CCCMetric", "ccc", "cccva",
           "acc_f1_score", "composite_scores"]
