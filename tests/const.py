import os

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
RESOURCE_DIR = os.path.join(REPO_ROOT, "resources")
SP_MODEL_DIR = os.path.join(RESOURCE_DIR, "sp-models")
CONFIG_DIR = os.path.join(RESOURCE_DIR, "configs")

DEFAULT_LIBRI_CONFIG = os.path.join(CONFIG_DIR, "libri_config.yml")
DEFAULT_KSPON_CONFIG = os.path.join(CONFIG_DIR, "kspon_config.yml")
SP_MODEL_LIBRI = os.path.join(SP_MODEL_DIR, "sp_model_unigram_16K_libri.model")
SP_MODEL_KSPON = os.path.join(SP_MODEL_DIR, "sp_model_unigram_8K_kspon.model")

DEFAULT_LAS_CONFIG = os.path.join(CONFIG_DIR, "las_small.yml")
DEFAULT_DS_CONFIG = os.path.join(CONFIG_DIR, "deepspeech.yml")

TEST_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
WAV_DATASET_PATH = os.path.join(TEST_DATA_DIR, "wav_dataset.tsv")
PCM_DATASET_PATH = os.path.join(TEST_DATA_DIR, "pcm_dataset.tsv")
KSPON_DATASET_PATH = os.path.join(TEST_DATA_DIR, "kspon_dataset.tsv")
TFRECORD_DATASET_PATH = os.path.join(TEST_DATA_DIR, "wav_dataset.tfrecord")
KSPON_MINI_DATA_CONFIG = os.path.join(TEST_DATA_DIR, "kspon_mini_data_config.yml")

TEST_MODEL_CONFIG_DIR = os.path.join(TEST_DATA_DIR, "model-configs")
TEST_LAS_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "las_mini_for_test.yml")
TEST_DS_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "deepspeech_mini_for_test.yml")
TEST_DS_MOE_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "deepspeech_moe_mini_for_test.yml")
TEST_CONFORMER_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "conformer_mini_for_test.yml")
TEST_TRANSDUCER_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "transducer_mini_for_test.yml")
TEST_TRANSDUCER_PRUNED_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "transducer_pruned_mini_for_test.yml")
TEST_LAS_KSPON_CONFIG = os.path.join(TEST_MODEL_CONFIG_DIR, "las_mini_kspon_for_test.yml")

# read-only upstream fixtures used solely for parity checks (skipped if absent)
REFERENCE_DIR = "/root/reference"
REF_TFRECORD = os.path.join(REFERENCE_DIR, "tests/data/wav_dataset.tfrecord")
REF_WAV_TSV = os.path.join(REFERENCE_DIR, "tests/data/wav_dataset.tsv")
REF_AUDIO_DIR = os.path.join(REFERENCE_DIR, "tests/data/audio_files")
