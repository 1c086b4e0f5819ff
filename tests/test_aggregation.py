"""Table tests for the call-level aggregation business rules
(reference: services/sentiment_analysis.py:437-528)."""

import pytest

from audio_processor_tpu.host.aggregation import (
    aggregate_agent_sentiment, aggregate_client_sentiment,
    call_id_from_chunk_filename, pretty_sentiment,
)


def test_pretty_sentiment_mapping():
    assert pretty_sentiment("content") == "Content"
    assert pretty_sentiment("mecontent") == "Mécontent"
    assert pretty_sentiment("très mécontent") == "Très Mécontent"
    assert pretty_sentiment("tres mecontent") == "Très Mécontent"
    assert pretty_sentiment("aggressive") == "Agressif"
    assert pretty_sentiment("SEC ") == "Sec"
    assert pretty_sentiment(None) == "Vide"
    assert pretty_sentiment("whatever") == "Whatever"  # capitalize fallback


@pytest.mark.parametrize("sentiments,expected", [
    ([], "Inconnu"),
    (["", "  "], "Inconnu"),
    # P1: last == Content wins even over Très Mécontent.
    (["très mécontent", "content"], "Content"),
    # P2: any Très Mécontent.
    (["content", "très mécontent", "neutre"], "Très Mécontent"),
    # P3: any Mécontent.
    (["content", "mécontent", "neutre"], "Mécontent"),
    # P4: >=50% Neutre.
    (["neutre", "neutre", "content", "neutre"], "Neutre"),
    # P5: majority fallback.
    (["content", "content", "neutre"], "Content"),
])
def test_aggregate_client(sentiments, expected):
    assert aggregate_client_sentiment(sentiments) == expected


@pytest.mark.parametrize("sentiments,expected", [
    ([], "Inconnu"),
    # P1: any Agressif.
    (["courtois", "aggressive", "neutre"], "Agressif"),
    # P2a: last == Sec.
    (["courtois", "courtois", "sec"], "Sec"),
    # P2b: >=30% Sec.
    (["sec", "courtois", "courtois"], "Sec"),
    # P3: last Courtois and >=50% Courtois.
    (["courtois", "neutre", "courtois"], "Courtois"),
    # P4: last Neutre, no Sec.
    (["courtois", "neutre"], "Neutre"),
    # P5: majority fallback: last is courtois but <50% courtois.
    (["neutre", "neutre", "neutre", "courtois"],
     "Neutre"),
])
def test_aggregate_agent(sentiments, expected):
    assert aggregate_agent_sentiment(sentiments) == expected


def test_agent_last_courtois_under_half_falls_to_majority():
    # last == Courtois but only 1/3 courtois -> majority (Neutre).
    assert aggregate_agent_sentiment(["neutre", "neutre", "courtois"]) == "Neutre"


def test_call_id_from_chunk_filename():
    assert call_id_from_chunk_filename("call123.wav", None) == "call123"
    assert call_id_from_chunk_filename("call123_4.wav", 4) == "call123"
    assert call_id_from_chunk_filename("call123_4.wav", 5) == "call123_4"
    assert call_id_from_chunk_filename("call123.ogg", 0) == "call123"


def test_remove_special_characters():
    from audio_processor_tpu.utils.text import remove_special_characters
    assert remove_special_characters("Salam, Labas?") == "salam labas"
    assert remove_special_characters("واش؟ نعم، شكراً") == "واش نعم شكراً"
    assert remove_special_characters(None) == ""
    assert remove_special_characters("a-b.c!d;e:f\"g%h'i»j«k(l)m") == "abcdefghijklm"
