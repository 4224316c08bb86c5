"""Schema-registry artifact lifecycle — the Apicurio v2 CRUD plane the
reference provisions its Avro topics with (``10_create_schemas.py``:
``post_schema``/``get_schema``/``delete_schema`` against
``/apis/registry/v2/groups/default/artifacts``), modeled as a local
artifact store with the same operations, id spaces, and error
semantics. No HTTP server exists in this environment (and none is
needed by the engine: the registry is control-plane metadata), so the
store is an embeddable object with optional JSON-file persistence —
the runtime data plane (wire framing, schema-resolved decode) already
lives in ``serde.py`` and consumes the ids this catalog assigns.

Semantics reproduced:

* ``create_artifact`` — POST; an existing artifact id conflicts (the
  reference deletes first, replaying Apicurio's 409) unless
  ``if_exists="UPDATE"``, which appends a new VERSION (Apicurio's
  ``ifExists=UPDATE`` query param). Every version gets a fresh
  monotonic ``globalId`` — the id the Confluent-compatible wire
  framing embeds (serde.frame_registry).
* ``get_artifact`` — GET latest version content; unknown id raises
  ``ArtifactNotFound`` (the 404 the reference catches as
  "Schema not found").
* ``delete_artifact`` — DELETE all versions; idempotent like the
  reference's try/except wrapper when ``missing_ok=True``.
* ``get_by_global_id`` — the deserializer's lookup path: wire frame →
  globalId → writer schema (feeds serde.resolve_decode_plan).
* compatibility rules — ``set_rule(artifact_id, "BACKWARD")`` gates
  ``if_exists="UPDATE"``: the NEW (reader) schema must be able to read
  data written with the LATEST version (removed fields need defaults
  on the writer side or the reader field needs a default; type changes
  must be legal Avro promotions). Enforcement reuses serde's
  resolve_decode_plan — the same resolution the data plane runs, so
  "compatible" here means "the engine can actually decode it".
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


class ArtifactNotFound(KeyError):
    """404: no artifact (or version) with that id."""


class ArtifactExists(ValueError):
    """409: POST of an artifact id that already exists."""


class RuleViolation(ValueError):
    """409: version update rejected by the artifact's compat rule."""


@dataclass
class _Version:
    version: int
    global_id: int
    content: str


@dataclass
class _Artifact:
    artifact_id: str
    versions: list[_Version] = field(default_factory=list)
    rule: str | None = None


class SchemaRegistry:
    """Embeddable Apicurio-v2-semantics artifact store.

    ``path`` persists the store as one JSON file (load on init, save
    after every mutation) so batch jobs and tests share a registry the
    way the reference's services share the Apicurio endpoint.
    """

    def __init__(self, path: str | None = None) -> None:
        self._path = path
        self._artifacts: dict[str, _Artifact] = {}
        self._next_global_id = 1
        if path and os.path.exists(path):
            self._load()

    # -- persistence -------------------------------------------------------

    def _load(self) -> None:
        with open(self._path) as fh:  # type: ignore[arg-type]
            raw = json.load(fh)
        self._next_global_id = raw["next_global_id"]
        for a in raw["artifacts"]:
            art = _Artifact(a["artifact_id"], rule=a.get("rule"))
            art.versions = [_Version(**v) for v in a["versions"]]
            self._artifacts[art.artifact_id] = art

    def _save(self) -> None:
        if not self._path:
            return
        raw = {"next_global_id": self._next_global_id,
               "artifacts": [
                   {"artifact_id": a.artifact_id, "rule": a.rule,
                    "versions": [vars(v) for v in a.versions]}
                   for a in self._artifacts.values()]}
        tmp = f"{self._path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(raw, fh)
        os.replace(tmp, self._path)

    # -- CRUD (10_create_schemas.py parity) --------------------------------

    def create_artifact(self, artifact_id: str, content: str,
                        if_exists: str = "FAIL") -> dict:
        """POST /groups/default/artifacts (X-Registry-ArtifactId
        header analog). Returns the metadata dict the reference
        pretty-prints."""
        json.loads(content)  # reject non-JSON schema bodies up front
        art = self._artifacts.get(artifact_id)
        if art is not None and art.versions:
            if if_exists != "UPDATE":
                raise ArtifactExists(artifact_id)
            self._check_rule(art, content)
        elif art is None:
            art = self._artifacts.setdefault(artifact_id,
                                             _Artifact(artifact_id))
        ver = _Version(version=len(art.versions) + 1,
                       global_id=self._next_global_id, content=content)
        self._next_global_id += 1
        art.versions.append(ver)
        self._save()
        return self._meta(art, ver)

    def get_artifact(self, artifact_id: str,
                     version: int | None = None) -> str:
        """GET artifact content (latest version by default)."""
        art = self._artifacts.get(artifact_id)
        if art is None or not art.versions:
            raise ArtifactNotFound(artifact_id)
        if version is None:
            return art.versions[-1].content
        for v in art.versions:
            if v.version == version:
                return v.content
        raise ArtifactNotFound(f"{artifact_id}/versions/{version}")

    def get_metadata(self, artifact_id: str) -> dict:
        art = self._artifacts.get(artifact_id)
        if art is None or not art.versions:
            raise ArtifactNotFound(artifact_id)
        return self._meta(art, art.versions[-1])

    def delete_artifact(self, artifact_id: str,
                        missing_ok: bool = False) -> None:
        """DELETE all versions of the artifact."""
        if artifact_id not in self._artifacts:
            if missing_ok:
                return
            raise ArtifactNotFound(artifact_id)
        del self._artifacts[artifact_id]
        self._save()

    def list_artifacts(self) -> list[str]:
        return sorted(a for a, art in self._artifacts.items()
                      if art.versions)

    def list_versions(self, artifact_id: str) -> list[int]:
        art = self._artifacts.get(artifact_id)
        if art is None or not art.versions:
            raise ArtifactNotFound(artifact_id)
        return [v.version for v in art.versions]

    def get_by_global_id(self, global_id: int) -> str:
        """The deserializer's wire-frame lookup: globalId → schema."""
        for art in self._artifacts.values():
            for v in art.versions:
                if v.global_id == global_id:
                    return v.content
        raise ArtifactNotFound(f"globalId {global_id}")

    def global_id(self, artifact_id: str) -> int:
        """Latest version's globalId — what frame_registry embeds."""
        art = self._artifacts.get(artifact_id)
        if art is None or not art.versions:
            raise ArtifactNotFound(artifact_id)
        return art.versions[-1].global_id

    # -- compatibility rules ------------------------------------------------

    def set_rule(self, artifact_id: str, rule: str) -> None:
        """PUT /artifacts/{id}/rules — only BACKWARD (and NONE) exist
        here; it is the rule the reference's CDC evolution relies on."""
        if rule not in ("BACKWARD", "NONE"):
            raise ValueError(f"unsupported rule {rule!r}")
        art = self._artifacts.get(artifact_id)
        if art is None or not art.versions:
            raise ArtifactNotFound(artifact_id)
        art.rule = rule
        self._save()

    def _check_rule(self, art: _Artifact, new_content: str) -> None:
        if art.rule != "BACKWARD":
            return
        from ..serde import resolve_decode_plan
        writer = art.versions[-1].content  # data already on the topic
        try:
            resolve_decode_plan(writer, new_content)
        except Exception as exc:
            raise RuleViolation(
                f"{art.artifact_id}: new version cannot read data "
                f"written with v{art.versions[-1].version}: {exc}") \
                from exc

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _meta(art: _Artifact, ver: _Version) -> dict:
        """The metadata shape the reference pretty-prints from POST."""
        name = None
        try:
            name = json.loads(ver.content).get("name")
        except AttributeError:  # non-record schema (bare type string)
            pass
        return {"id": art.artifact_id, "name": name, "type": "AVRO",
                "version": ver.version, "globalId": ver.global_id,
                "state": "ENABLED"}
