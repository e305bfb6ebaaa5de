"""Every component name used in the reference's example configs must
resolve through our registry (reference eg_configs/ type strings)."""

import pytest

import texttoaudiogrounding_tpu  # noqa: F401 - populate registry
from texttoaudiogrounding_tpu.utils.registry import resolve

# type strings as they appear in reference eg_configs/ YAMLs
REFERENCE_TYPE_NAMES = [
    "models.audio_encoder.Cnn8_Rnn",
    "models.audio_encoder.CrnnEncoder",
    "models.text_encoder.EmbeddingAgg",
    "models.text_encoder.RnnEncoder",
    "models.text_encoder.IntraAttention",
    "models.text_encoder.SelfAttention",
    "models.text_encoder.Bert",
    "models.text_encoder.SentenceBert",
    "models.text_encoder.LaionClapEncoder",
    "models.match.DotProduct",
    "models.match.ExpNegL2",
    "models.match.CrossAttention",
    "models.cross_encoder.CrossAttentionGating",
    "models.audio_text_model.BiEncoder",
    "models.audio_text_model.MultiTextBiEncoder",
    "models.audio_text_model.MultiTextBiEncoderWithAlign",
    "models.audio_text_model.AudioTagging",
    "models.audio_text_model.CrossCDur",
    "models.audio_text_model.CrossCnn8_Rnn",
    "models.audio_text_model.AudioTextAlignByWord",
    "models.audio_text_model.AudioTextAlignByPhrase",
    "models.audio_text_model.AudioTextCrossAlignByPhrase",
    "models.sim_pooling.AudioMeanTextMean",
    "models.sim_pooling.AudioMaxTextMean",
    "models.sim_pooling.AudioLinearSoftTextSum",
    "models.sim_pooling.MultiTextLinearSoft",
    "losses.FrameBceLoss",
    "losses.ClipBceLoss",
    "losses.MilNceLoss",
    "losses.ClipFrameBceLoss",
    "losses.InfoNceLoss",
    "losses.MaxMarginRankingLoss",
    "losses.MaxTripletLoss",
    "datasets.single_phrase_dataset.AudioPhraseDataset",
    "datasets.single_phrase_dataset.AudioPhraseEvalDataset",
    "datasets.multi_phrase_dataset.AudioSamplePhrasesDataset",
    "datasets.multi_phrase_dataset.SamplePhrasesCountDataset",
    "datasets.multi_phrase_dataset.AudioCaptionPhrasesDataset",
    "datasets.caption_dataset.AudioCaptionDataset",
    "datasets.class_mapping_dataset.ASMappingWeakDataset",
    "datasets.class_mapping_dataset.KmeansMappingDataset",
    "datasets.collate_function.VarLenPadCollate",
    "datasets.collate_function.TextCollate",
    "datasets.collate_function.VarNumTextCollate",
    "datasets.text_tokenizer.DictTokenizer",
    "datasets.text_tokenizer.HuggingFaceTokenizer",
    "torch.optim.lr_scheduler.ReduceLROnPlateau",
]


@pytest.mark.parametrize("name", REFERENCE_TYPE_NAMES)
def test_reference_type_name_resolves(name):
    assert callable(resolve(name))


def test_class_mapping_runner_registers_class():
    """Regression: the @register decorator must sit on the runner class,
    not the output transform defined above it (round-2 advisor finding)."""
    import texttoaudiogrounding_tpu.training.runner_class_mapping as rcm

    assert resolve("ClassMappingStrongRunner") is rcm.ClassMappingStrongRunner
    assert isinstance(resolve("ClassMappingStrongRunner"), type)
