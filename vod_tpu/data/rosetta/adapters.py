"""Dataset adapters: first adapter whose input schema validates the first row wins.

Parity: reference `vod_datasets/rosetta/adapters/` (13 adapters across 10 files:
identity x3, mcqa, squad, trivia_qa, text_to_text, missing_fields, rename/alias)
and `rosetta/interface.py:49` (`transform`) / `interface.py:15` (`find_adapter`).

Field-name aliases let one input model match many public datasets (the
reference's `aliases.py` lists); validation aliases are pydantic's mechanism for
the same idea.
"""

from __future__ import annotations

import typing as typ
import uuid

import pydantic
from pydantic import AliasChoices, Field

from .models import QueryModel, QueryWithContextsModel, SectionModel

# --- alias sets (parity: `adapters/aliases.py`) --------------------------------
QUERY_ALIASES = AliasChoices("query", "question", "question_text", "text", "instruction", "prompt")
QUERY_ID_ALIASES = AliasChoices("id", "_id", "qid", "query_id", "question_id", "uid")
ANSWER_ALIASES = AliasChoices("answer", "answers", "answer_text", "output", "target", "response")
CHOICES_ALIASES = AliasChoices("choices", "options", "candidates", "answer_choices", "opa_choices")
ANSWER_IDX_ALIASES = AliasChoices("answer", "answer_idx", "label", "correct_answer_idx", "cop")
CONTENT_ALIASES = AliasChoices("content", "text", "passage", "context", "document", "body", "contents")
TITLE_ALIASES = AliasChoices("title", "document_title", "heading")
SECTION_ID_ALIASES = AliasChoices("id", "_id", "pid", "doc_id", "passage_id", "section_id")
CONTEXTS_ALIASES = AliasChoices("contexts", "context", "passages", "documents", "positive_ctxs")

_LETTERS = "ABCDEFGHIJ"


class Adapter:
    """Base adapter: `input_model` validates raw rows, `translate_row` maps them."""

    input_model: typ.ClassVar[typ.Type[pydantic.BaseModel]]
    output_model: typ.ClassVar[typ.Type[pydantic.BaseModel]]

    @classmethod
    def can_handle(cls, row: dict) -> bool:
        try:
            cls.input_model(**row)
            return True
        except pydantic.ValidationError:
            return False

    @classmethod
    def translate_row(cls, row: dict) -> pydantic.BaseModel:
        raise NotImplementedError

    @classmethod
    def translate(cls, data: typ.Any, map_kwargs: typ.Optional[dict] = None) -> typ.Any:
        """Translate a row dict, a list of rows, or a HF dataset."""
        if isinstance(data, dict):
            return cls.translate_row(data).model_dump()
        if isinstance(data, list):  # e.g. local BeIR directories, test fixtures
            return [cls.translate_row(row).model_dump() for row in data]
        import datasets as hf_datasets

        if isinstance(data, hf_datasets.Dataset):
            return data.map(
                lambda row: cls.translate_row(row).model_dump(),
                remove_columns=data.column_names,
                desc=f"rosetta:{cls.__name__}",
                **(map_kwargs or {}),
            )
        raise TypeError(f"Cannot adapt {type(data)}")


# --- identity adapters ----------------------------------------------------------
class IdentityQueryAdapter(Adapter):
    input_model = QueryModel
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        return QueryModel(**{k: row[k] for k in QueryModel.model_fields if k in row})


class IdentitySectionAdapter(Adapter):
    input_model = SectionModel
    output_model = SectionModel

    @classmethod
    def translate_row(cls, row: dict) -> SectionModel:
        return SectionModel(**{k: row[k] for k in SectionModel.model_fields if k in row})


class IdentityQueryWithContextsAdapter(Adapter):
    input_model = QueryWithContextsModel
    output_model = QueryWithContextsModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryWithContextsModel:
        return QueryWithContextsModel(
            **{k: row[k] for k in QueryWithContextsModel.model_fields if k in row}
        )


# --- renamed/aliased fields (parity: `rename_fields.py:10,81`) -------------------
class _AliasedQueryInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=QUERY_ID_ALIASES)
    query: str = Field(validation_alias=QUERY_ALIASES)
    answer: typ.Union[str, list[str]] = Field(validation_alias=ANSWER_ALIASES)

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


class AliasedQueryAdapter(Adapter):
    input_model = _AliasedQueryInput
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        m = cls.input_model(**row)
        answers = m.answer if isinstance(m.answer, list) else [m.answer]
        return QueryModel(
            id=m.id, query=m.query, answers=answers, answer_scores=[1.0] * len(answers)
        )


class _AliasedSectionInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=SECTION_ID_ALIASES)
    content: str = Field(validation_alias=CONTENT_ALIASES)
    title: typ.Optional[str] = Field(default=None, validation_alias=TITLE_ALIASES)
    subset_id: typ.Optional[str] = None

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


class AliasedSectionAdapter(Adapter):
    input_model = _AliasedSectionInput
    output_model = SectionModel

    @classmethod
    def translate_row(cls, row: dict) -> SectionModel:
        m = cls.input_model(**row)
        return SectionModel(id=m.id, content=m.content, title=m.title, subset_id=m.subset_id)


# --- multiple choice (parity: `mcqa.py:44,72`) -----------------------------------
class _McqaInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=QUERY_ID_ALIASES)
    query: str = Field(validation_alias=QUERY_ALIASES)
    choices: list[str] = Field(validation_alias=CHOICES_ALIASES)
    answer: typ.Union[int, str] = Field(validation_alias=ANSWER_IDX_ALIASES)

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


def _choice_index(answer: typ.Union[int, str], n: int) -> int:
    if isinstance(answer, int):
        idx = answer
    elif answer in _LETTERS:
        idx = _LETTERS.index(answer)
    else:
        raise ValueError(f"Cannot interpret MCQA answer {answer!r}")
    if not 0 <= idx < n:
        raise ValueError(f"MCQA answer index {idx} out of range ({n} choices)")
    return idx


class McqaQueryAdapter(Adapter):
    """Answer choices -> one-hot answer_scores."""

    input_model = _McqaInput
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        m = cls.input_model(**row)
        scores = [0.0] * len(m.choices)
        scores[_choice_index(m.answer, len(m.choices))] = 1.0
        return QueryModel(id=m.id, query=m.query, answers=m.choices, answer_scores=scores)


class _McqaWithContextsInput(_McqaInput):
    contexts: typ.Union[list[str], str] = Field(validation_alias=CONTEXTS_ALIASES)


class McqaQueryWithContextsAdapter(Adapter):
    input_model = _McqaWithContextsInput
    output_model = QueryWithContextsModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryWithContextsModel:
        m = cls.input_model(**row)
        scores = [0.0] * len(m.choices)
        scores[_choice_index(m.answer, len(m.choices))] = 1.0
        ctx = m.contexts if isinstance(m.contexts, list) else [m.contexts]
        return QueryWithContextsModel(
            id=m.id, query=m.query, answers=m.choices, answer_scores=scores, contexts=ctx
        )


# --- squad-style (parity: `squad.py:37,58`) --------------------------------------
class _SquadAnswers(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore")
    text: list[str]


class _SquadInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=QUERY_ID_ALIASES)
    question: str
    context: str
    answers: _SquadAnswers
    title: typ.Optional[str] = None

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


class SquadQueryWithContextsAdapter(Adapter):
    input_model = _SquadInput
    output_model = QueryWithContextsModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryWithContextsModel:
        m = cls.input_model(**row)
        answers = m.answers.text or [""]
        return QueryWithContextsModel(
            id=m.id,
            query=m.question,
            answers=answers,
            answer_scores=[1.0] * len(answers),
            contexts=[m.context],
            titles=[m.title] if m.title is not None else None,
        )


# --- trivia-qa-style (parity: `trivia_qa.py:36`) ---------------------------------
class _TriviaAnswer(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore")
    value: str
    aliases: list[str] = Field(default_factory=list)


class _TriviaInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=QUERY_ID_ALIASES)
    question: str
    answer: _TriviaAnswer

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


class TriviaQaQueryAdapter(Adapter):
    input_model = _TriviaInput
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        m = cls.input_model(**row)
        answers = [m.answer.value, *[a for a in m.answer.aliases if a != m.answer.value]]
        return QueryModel(
            id=m.id, query=m.question, answers=answers, answer_scores=[1.0] * len(answers)
        )


# --- text-to-text (parity: `text_to_text.py:22`) ---------------------------------
class _TextToTextInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore")
    source: str = Field(validation_alias=AliasChoices("source", "input", "input_text", "src"))
    target: str = Field(validation_alias=AliasChoices("target", "output", "output_text", "tgt"))


class TextToTextQueryAdapter(Adapter):
    input_model = _TextToTextInput
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        m = cls.input_model(**row)
        return QueryModel(query=m.source, answers=[m.target], answer_scores=[1.0])


# --- missing-fields fill-in (parity: `missing_fields.py:44,91`) -------------------
class _QueryNoAnswerInput(pydantic.BaseModel):
    model_config = pydantic.ConfigDict(extra="ignore", populate_by_name=True)
    id: str = Field(default_factory=lambda: uuid.uuid4().hex, validation_alias=QUERY_ID_ALIASES)
    query: str = Field(validation_alias=QUERY_ALIASES)

    @pydantic.field_validator("id", mode="before")
    @classmethod
    def _coerce_id(cls, v: typ.Any) -> str:
        return str(v)


class MissingFieldsQueryAdapter(Adapter):
    """Queries without answers (retrieval-only datasets)."""

    input_model = _QueryNoAnswerInput
    output_model = QueryModel

    @classmethod
    def translate_row(cls, row: dict) -> QueryModel:
        m = cls.input_model(**row)
        return QueryModel(id=m.id, query=m.query)


# --- registry + transform --------------------------------------------------------
# Order matters: most specific first (parity: `rosetta/interface.py:49` tries
# queries_with_context adapters before plain query/section adapters).
ADAPTERS: dict[str, list[typ.Type[Adapter]]] = {
    "queries_with_context": [
        IdentityQueryWithContextsAdapter,
        SquadQueryWithContextsAdapter,
        McqaQueryWithContextsAdapter,
    ],
    "queries": [
        IdentityQueryAdapter,
        McqaQueryAdapter,
        TriviaQaQueryAdapter,
        TextToTextQueryAdapter,
        AliasedQueryAdapter,
        MissingFieldsQueryAdapter,
    ],
    "sections": [
        IdentitySectionAdapter,
        AliasedSectionAdapter,
    ],
}


def find_adapter(row: dict, kind: str) -> typ.Optional[typ.Type[Adapter]]:
    """First adapter (for `kind`) whose input model validates the row."""
    for adapter in ADAPTERS[kind]:
        if adapter.can_handle(row):
            return adapter
    return None


def transform(data: typ.Any, kind: str, map_kwargs: typ.Optional[dict] = None) -> typ.Any:
    """Translate a dataset/row into the canonical schema for `kind`
    ('queries' | 'sections'). Queries-with-context datasets are isolated into
    separate query + section shards by `preprocessing.isolate_qa_and_sections`.
    """
    first = data[0] if not isinstance(data, dict) else data
    if kind == "queries":
        qc = find_adapter(first, "queries_with_context")
        if qc is not None:
            from vod_tpu.data.preprocessing import isolate_qa_and_sections

            translated = qc.translate(data, map_kwargs)
            return isolate_qa_and_sections(translated)
    adapter = find_adapter(first, kind)
    if adapter is None:
        raise ValueError(
            f"No rosetta adapter matches this row for kind={kind!r}: {sorted(first)[:20]}"
        )
    return adapter.translate(data, map_kwargs)
