"""Template for registering custom feature extractors
(reference: encoding/features/custom.py).

Example:

    from litcoder_core_tpu.features.base import BaseFeatureExtractor
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory

    class MyExtractor(BaseFeatureExtractor):
        def extract_features(self, stimuli, **kwargs):
            ...  # return (n_items, dim) np.ndarray

    FeatureExtractorFactory.register_extractor("my_modality", MyExtractor)

After registration, `FeatureExtractorFactory.create_extractor("my_modality",
...)` works like any built-in modality.
"""
