"""TopicClassifier tests with an injected fake Bedrock client
(reference: services/topics_inf.py)."""

import json

import pytest

from audio_processor_tpu.config import PipelineConfig
from audio_processor_tpu.host.topics import TopicClassifier

from tests.xlsx_writer import write_xlsx


class FakeBedrock:
    """Canned summary + classification responses."""

    def __init__(self, summary="Résumé : Le client demande une recharge.",
                 index="2"):
        self.summary = summary
        self.index = index
        self.calls = []

    def invoke_model(self, modelId, body, accept, contentType):
        import io

        payload = json.loads(body)
        self.calls.append(payload)
        prompt = payload["messages"][0]["content"]
        text = self.index if "réponds STRICTEMENT" in prompt \
            else self.summary
        response_body = json.dumps(
            {"content": [{"text": text}]}).encode()
        return {"body": io.BytesIO(response_body)}


@pytest.fixture
def glossary(tmp_path):
    p = tmp_path / "glossaire.xlsx"
    write_xlsx(p, {"explication": [
        ["Catégorie", "Type de spécialité", "Explication"],
        ["Facturation", "Litige", "Contestations de factures"],
        ["Recharge", "Recharge mobile", "Demandes de recharge"],
        ["Réseau", "Couverture", "Problèmes de réseau"],
    ]})
    return p


def _classifier(glossary, fake):
    cfg = PipelineConfig(topics_glossary_b2c=str(glossary),
                         topics_glossary_b2b=str(glossary),
                         summary_model_id="m", class_model_id="m")
    return TopicClassifier(cfg, client=fake)


def test_infer_full_flow(glossary):
    fake = FakeBedrock(index="2")
    tc = _classifier(glossary, fake)
    assert tc.enabled
    summary, cat, typ = tc.infer("salam bghit recharge", "B2C")
    assert cat == "Recharge"
    assert typ == "Recharge mobile"
    # clean_summary stripped the "Résumé :" prefix
    assert summary == "Le client demande une recharge."
    # classification prompt contains the numbered catalogue
    classify_prompt = fake.calls[-1]["messages"][0]["content"]
    assert "1. Facturation – Litige : Contestations de factures" \
        in classify_prompt
    assert "2. Recharge" in classify_prompt


def test_invalid_index_maps_unknown(glossary):
    tc = _classifier(glossary, FakeBedrock(index="99"))
    _, cat, typ = tc.infer("x", "B2C")
    assert (cat, typ) == ("UNKNOWN", "UNKNOWN")
    tc2 = _classifier(glossary, FakeBedrock(index="not-a-number"))
    _, cat2, _ = tc2.infer("x", "B2C")
    assert cat2 == "UNKNOWN"


def test_clean_summary_variants():
    clean = TopicClassifier.clean_summary
    assert clean("Résumé : hello") == "hello"
    assert clean("Résumé en français (120 mots) : hello") == "hello"
    assert clean("no prefix here") == "no prefix here"


def test_disabled_without_credentials(monkeypatch, glossary):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    cfg = PipelineConfig(topics_glossary_b2c=str(glossary))
    tc = TopicClassifier(cfg)
    assert not tc.enabled
    assert tc.infer("x") == ("Service non disponible", "Appel blanc",
                             "Non classifié")


def test_sentiment_wiring_uses_topics(glossary):
    """Call-level aggregation formats topics as 'cat - type'
    (reference stubbed this to '', sentiment_analysis.py:432-435)."""
    from audio_processor_tpu.pipeline.sentiment import SentimentAnalyzer

    tc = _classifier(glossary, FakeBedrock(index="3"))
    an = SentimentAnalyzer(PipelineConfig(), topic_classifier=tc)
    out = an.sentiment_appel_topics(
        [{"transcription_chunk": "salam"}], "B2C")
    assert out == "Réseau - Couverture"
