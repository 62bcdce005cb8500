"""DECLARED LITERAL TRANSCRIPTION (test-only parity oracle) of the reference
conceptualizer — ``/root/reference/src/pattern/conceptualizer.py`` (MIT).

Same role as ``tests/reference_port.py`` plays for the matcher/miner: an
independent, single-process transcription with ZERO ``folkscope_spark``
imports, against which the production kernels are differential-tested
(``tests/test_conceptualizer_port.py``).  Control flow, variable roles and
quirks are kept line-faithful on purpose, including:

* the always-True fallback guard ``concept_after_seed_rule != " ".join(words)``
  (list vs str compare — conceptualizer.py:384-387);
* the text path's **in-loop mutation** of ``start_index`` while locating the
  phrase-level start segment (``:426-427`` — later ranges compare against the
  already-reassigned value);
* per-(type, word) seed-rule placeholder indexing (``:265-277``);
* top-K dedupe by hyphenated concept surface (``:512-521``);
* the combination-search heap with its early-stop heuristic (``:526-566``).

The Probase side is ``ProbaseConcept`` (``:19-83``) rebuilt from an in-memory
``(concept, instance, freq)`` triple list instead of a TSV file — index
construction and likelihood scoring are transcribed as-is (insertion-ordered
inverted lists, stable sort by score desc).
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from itertools import chain, combinations


class ProbaseConceptPort:
    """conceptualizer.py:19-83 (file I/O replaced by a triples list)."""

    def __init__(self, triples):
        self.concept2idx = {}
        self.instance2idx = {}
        self.concept_inverted_list = {}
        self.instance_inverted_list = {}
        for concept, instance, freq in triples:
            if concept not in self.concept2idx:
                self.concept2idx[concept] = len(self.concept2idx)
            concept_idx = self.concept2idx[concept]
            if instance not in self.instance2idx:
                self.instance2idx[instance] = len(self.instance2idx)
            instance_idx = self.instance2idx[instance]
            if concept_idx not in self.concept_inverted_list:
                self.concept_inverted_list[concept_idx] = list()
            self.concept_inverted_list[concept_idx].append((instance_idx, int(freq)))
            if instance_idx not in self.instance_inverted_list:
                self.instance_inverted_list[instance_idx] = list()
            self.instance_inverted_list[instance_idx].append((concept_idx, int(freq)))
        self.idx2concept = {v: k for k, v in self.concept2idx.items()}
        self.idx2instance = {v: k for k, v in self.instance2idx.items()}

    def get_instance_freq(self, instance_idx):
        return sum(freq for _, freq in self.instance_inverted_list[instance_idx])

    def conceptualize(self, instance, score_method="likelihood"):
        if instance not in self.instance2idx:
            return []
        instance_idx = self.instance2idx[instance]
        instance_freq = self.get_instance_freq(instance_idx)
        concept_list = self.instance_inverted_list[instance_idx]
        rst_list = list()
        for concept_idx, co_occurrence in concept_list:
            if score_method == "likelihood":
                score = co_occurrence / instance_freq
            else:
                raise NotImplementedError
            rst_list.append((self.idx2concept[concept_idx], score))
        rst_list.sort(key=lambda x: x[1], reverse=True)
        return rst_list


class SeedRuleConceptualizerPort:
    """conceptualizer.py:226-288."""

    def __init__(self):
        self.selected_ners = frozenset(
            [
                "TIME", "DATE", "DURATION", "MONEY", "PERCENT", "NUMBER",
                "COUNTRY", "STATE_OR_PROVINCE", "CITY", "NATIONALITY",
                "PERSON", "RELIGION", "URL",
            ]
        )
        self.seed_concepts = frozenset(self._render_ner(n) for n in self.selected_ners)
        self.person_pronoun_set = frozenset(
            ["he", "she", "i", "him", "her", "me", "woman", "man", "boy",
             "girl", "you", "we", "they"]
        )
        self.pronouns = self.person_pronoun_set | frozenset(["it"])

    def conceptualize_from_text(self, words, ners):
        output_words = list()
        ners_dict = {ner: dict() for ner in self.selected_ners}
        for word, ner in zip(words, ners):
            if ner in self.selected_ners:
                if word not in ners_dict[ner]:
                    ners_dict[ner][word] = len(ners_dict[ner])
                output_words.append(self._render_ner(ner) + "%d" % ners_dict[ner][word])
            elif word in self.person_pronoun_set:
                if word not in ners_dict["PERSON"]:
                    ners_dict["PERSON"][word] = len(ners_dict["PERSON"])
                output_words.append(
                    self._render_ner("PERSON") + "%d" % ners_dict["PERSON"][word]
                )
            else:
                output_words.append(word)
        return output_words

    def is_seed_concept(self, word):
        return word in self.seed_concepts

    def is_pronoun(self, word):
        return word in self.pronouns

    def _render_ner(self, ner):
        return "__" + ner + "__"


class ProbaseConceptualizerPort:
    """conceptualizer.py:290-637 (eventuality + text paths)."""

    def __init__(self, triples, topK):
        self.seed_conceptualizer = SeedRuleConceptualizerPort()
        self.probase = ProbaseConceptPort(triples)
        self.topK = topK

    # -- eventuality path (conceptualizer.py:305-390), restricted by the
    # differential suite to eventualities with no compound segments so the
    # ``Eventuality.phrases`` span-misread (object.py:602-607, a reference bug
    # the production code documents and does not copy) is never consulted
    def conceptualize_eventuality(self, words, ners, pos_tags, dependencies, start_index=0):
        if start_index == 0:
            concept_after_seed_rule = self.seed_conceptualizer.conceptualize_from_text(words, ners)
            concept_strs = self._get_probase_concepts(concept_after_seed_rule, pos_tags)
        else:
            concept_after_seed_rule = self.seed_conceptualizer.conceptualize_from_text(
                ["UNK"] * start_index + words[start_index:],
                ["O"] * start_index + ners[start_index:],
            )
            concept_after_seed_rule = (
                concept_after_seed_rule.__class__(words[:start_index])
                + concept_after_seed_rule[start_index:]
            )
            concept_strs = self._get_probase_concepts(
                concept_after_seed_rule, ["FW"] * start_index + pos_tags[start_index:]
            )
        segments = self._dep_compound_segment(words, dependencies)
        assert len(segments) == len(words), "port restricted to no-compound eventualities"
        if not concept_strs and concept_after_seed_rule != " ".join(words):
            concept_strs = [(concept_after_seed_rule, 1.0)]
        return concept_strs

    # -- text path (conceptualizer.py:392-492), full transcription
    def conceptualize_from_text(self, words, ners, pos_tags, dependencies, start_index=0):
        if start_index == 0:
            concept_after_seed_rule = self.seed_conceptualizer.conceptualize_from_text(words, ners)
            concept_strs = self._get_probase_concepts(concept_after_seed_rule, pos_tags)
        else:
            concept_after_seed_rule = self.seed_conceptualizer.conceptualize_from_text(
                ["UNK"] * start_index + words[start_index:],
                ["O"] * start_index + ners[start_index:],
            )
            concept_after_seed_rule = (
                concept_after_seed_rule.__class__(words[:start_index])
                + concept_after_seed_rule[start_index:]
            )
            concept_strs = self._get_probase_concepts(
                concept_after_seed_rule, ["FW"] * start_index + pos_tags[start_index:]
            )

        phrase_segment_indices = self._dep_compound_segment(words, dependencies)
        phrase_words = list()
        phrase_ners = list()
        phrase_pos_tags = list()
        for _range in phrase_segment_indices:
            st = min(_range)
            end = max(_range) + 1
            # NB: compares against the possibly-already-reassigned value —
            # transcribed as-is (conceptualizer.py:426-427)
            if start_index in _range:
                start_index = len(phrase_words)
            phrase_words.append(" ".join(words[st:end]))
            if isinstance(ners[_range[0]], str):
                ner = ners[_range[0]]
            else:
                for x in ners[_range[0]].most_common():
                    if x[0] != "O":
                        ner = x[0]
                        break
            phrase_ners.append(ner)
            phrase_pos_tags.append(pos_tags[_range[0]])

        if len(phrase_words) != len(words):
            concept_strs1 = concept_strs if concept_strs else []
            if start_index == 0:
                concept_after_seed_rule2 = self.seed_conceptualizer.conceptualize_from_text(
                    phrase_words, phrase_ners
                )
                concept_strs2 = self._get_probase_concepts(
                    concept_after_seed_rule2, phrase_pos_tags
                )
            else:
                concept_after_seed_rule2 = self.seed_conceptualizer.conceptualize_from_text(
                    ["UNK"] * start_index + phrase_words[start_index:],
                    ["O"] * start_index + phrase_ners[start_index:],
                )
                concept_after_seed_rule2 = (
                    concept_after_seed_rule2.__class__(phrase_words[:start_index])
                    + concept_after_seed_rule2[start_index:]
                )
                concept_strs2 = self._get_probase_concepts(
                    concept_after_seed_rule2,
                    ["FW"] * start_index + phrase_pos_tags[start_index:],
                )

            max_len = self.topK**self.topK
            used_concepts = set()
            concept_strs = []
            ptr1, ptr2, l1, l2 = 0, 0, len(concept_strs1), len(concept_strs2)
            while ptr1 < l1 and ptr2 < l2 and len(used_concepts) < max_len:
                if concept_strs1[ptr1][1] > concept_strs2[ptr2][1]:
                    concept_str = " ".join(concept_strs1[ptr1][0])
                    if concept_str not in used_concepts:
                        used_concepts.add(concept_str)
                        concept_strs.append(concept_strs1[ptr1])
                    ptr1 += 1
                else:
                    concept_str = " ".join(concept_strs2[ptr2][0])
                    if concept_str not in used_concepts:
                        used_concepts.add(concept_str)
                        concept_strs.append(concept_strs2[ptr2])
                    ptr2 += 1
            while ptr1 < l1 and len(used_concepts) < max_len:
                concept_str = " ".join(concept_strs1[ptr1][0])
                if concept_str not in used_concepts:
                    used_concepts.add(concept_str)
                    concept_strs.append(concept_strs1[ptr1])
                ptr1 += 1
            while ptr2 < l2 and len(used_concepts) < max_len:
                concept_str = " ".join(concept_strs2[ptr2][0])
                if concept_str not in used_concepts:
                    used_concepts.add(concept_str)
                    concept_strs.append(concept_strs2[ptr2])
                ptr2 += 1

        if not concept_strs and concept_after_seed_rule != " ".join(words):
            concept_strs = [(concept_after_seed_rule, 1.0)]
        return concept_strs

    # -- conceptualizer.py:494-566
    def _get_probase_concepts(self, words, pos_tags):
        word2indices = defaultdict(list)
        for idx, word in enumerate(words):
            word2indices[word].append(idx)

        word2concepts = dict()
        for i in range(len(pos_tags)):
            if i >= len(words):
                break
            word = words[i]
            tag = pos_tags[i]
            if tag.startswith("NN") and (len(word) > 0 and word[0].islower()):
                if self.seed_conceptualizer.is_seed_concept(word) or self.seed_conceptualizer.is_pronoun(word):
                    continue
                elif word not in word2concepts:
                    concepts = self.probase.conceptualize(word, score_method="likelihood")
                    if concepts:
                        concept_set = set()
                        valid_indices = list()
                        for idx, (tmp_concept, score) in enumerate(concepts):
                            tmp = tmp_concept.replace(" ", "-")
                            if tmp not in concept_set:
                                valid_indices.append(idx)
                                concept_set.add(tmp)
                            if len(valid_indices) >= self.topK:
                                break
                        word2concepts[word] = [
                            (concepts[idx][0].replace(" ", "-"), concepts[idx][1])
                            for idx in valid_indices
                        ]
                    else:
                        continue

        matched_words = list(word2concepts.keys())
        replace_word_tuples = list()
        for i in range(1, len(word2concepts) + 1):
            replace_word_tuples.extend(list(combinations(matched_words, i)))

        output_words_heap = list()
        max_len = self.topK**self.topK
        pre_min_score = 1.0
        min_score = -1.0
        pre_comb_len = 0
        comb_len = 1
        for word_tuples in replace_word_tuples:
            tmp_words_list = [(1.0, words)]
            for word in word_tuples:
                new_tmp_words_list = list()
                for prob, tmp_words in tmp_words_list:
                    for concept, c_prob in word2concepts[word]:
                        _tmp_words = tmp_words[:]
                        for idx in word2indices[word]:
                            _tmp_words[idx] = concept
                        new_tmp_words_list.append((prob * c_prob, _tmp_words))
                del tmp_words_list
                tmp_words_list = new_tmp_words_list

            for tmp in tmp_words_list:
                if len(output_words_heap) >= max_len:
                    tmp = heapq.heappushpop(output_words_heap, tmp)
                else:
                    heapq.heappush(output_words_heap, tmp)
                if min_score < tmp[0]:
                    min_score = tmp[0]
            comb_len = len(word_tuples)
            if pre_min_score == min_score and pre_comb_len + 1 < comb_len and len(output_words_heap) >= max_len:
                break
            if pre_min_score != min_score:
                pre_min_score = min_score
                pre_comb_len = comb_len

        output_words_list = [
            heapq.heappop(output_words_heap)[::-1] for i in range(len(output_words_heap))
        ][::-1]
        return output_words_list

    # -- conceptualizer.py:568-636
    def _dep_compound_segment(self, words, dependencies):
        tmp_compound_tuples = list()
        for governor_idx, dep, dependent_idx in dependencies:
            if dep.startswith("compound"):
                tmp_compound_tuples.append((governor_idx, dependent_idx))

        tmp_compound_tuples = sorted(tmp_compound_tuples)
        compound_tuples = list()
        used_indices = set()
        for i in range(len(tmp_compound_tuples)):
            if i in used_indices:
                continue
            s1 = tmp_compound_tuples[i]
            for j in range(i + 1, len(tmp_compound_tuples)):
                if j in used_indices:
                    continue
                s2 = tmp_compound_tuples[j]
                if s2[0] in set(s1[1:]):
                    s1 = s1 + s2[1:]
                    used_indices.add(j)
                elif s1[0] in set(s2[1:]):
                    s1 = s2 + s1[1:]
                    used_indices.add(j)
                elif s1[0] == s2[0]:
                    s1 = s1 + s2[1:]
                    used_indices.add(j)
                else:
                    break
            used_indices.add(i)
            sorted_s1 = sorted(s1)
            if sorted_s1[-1] - sorted_s1[0] == len(sorted_s1) - 1:
                compound_tuples.append(s1)
            else:
                s1s = []
                k1 = 0
                k2 = 1
                len_s1 = len(sorted_s1)
                indices = dict(zip(s1, range(len_s1)))
                while k2 < len_s1:
                    if sorted_s1[k2 - 1] + 1 != sorted_s1[k2]:
                        s1s.append(tuple([s1[indices[sorted_s1[k]]] for k in range(k1, k2)]))
                        k1 = k2
                    k2 += 1
                if k1 != k2:
                    s1s.append(tuple([s1[indices[sorted_s1[k]]] for k in range(k1, k2)]))
                compound_tuples.extend(s1s)

        compound_tuples.sort()
        used_indices = set(chain.from_iterable(compound_tuples))

        segment_rst = list()
        word_idx = 0
        compound_idx = 0
        num_words = len(words)
        num_tuples = len(compound_tuples)
        while word_idx < num_words:
            if word_idx not in used_indices:
                segment_rst.append((word_idx,))
            elif word_idx in used_indices and compound_idx < num_tuples and word_idx == compound_tuples[compound_idx][0]:
                segment_rst.append(compound_tuples[compound_idx])
                compound_idx += 1
            word_idx += 1
        return segment_rst
