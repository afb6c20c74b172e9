"""Model persistence (SURVEY.md §2.1 S3): the reference's
`joblib.dump(model_package, 'house_purchase_model.pkl')` (`Sol_2.ipynb:915`)
maps to `PipelineModel.save`/`load` — the fitted preprocessing state
(encoders, bin edges, scaler means) travels inside the PipelineModel rather
than a side dict.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel


def save_pipeline_model(model: PipelineModel, path: str) -> None:
    model.write().overwrite().save(path)


def load_pipeline_model(path: str) -> PipelineModel:
    return PipelineModel.load(path)
