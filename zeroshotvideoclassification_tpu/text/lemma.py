"""Verb lemmatization for class-name tokens.

The reference lemmatizes any token that has a WordNet verb synset back to its
base verb form (`verbs2basicform`, /root/reference/auxiliary/auxiliary_word2vec.py:212-219)
so e.g. 'running'->'run', 'cutting'->'cut' before Word2Vec lookup.

This module prefers the NLTK WordNet corpus when it is installed (exact
reference parity). When the corpus is unavailable (air-gapped TPU hosts), it
falls back to a self-contained implementation of WordNet's "morphy" rules of
detachment for verbs, backed by an embedded lexicon of action-vocabulary base
verbs and an irregular-form exception table. The fallback is deterministic and
covers the UCF101/HMDB51/Kinetics/ActivityNet class vocabularies.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence

# --------------------------------------------------------------------------
# Optional NLTK backend
# --------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _nltk_backend():
    """Return (synsets_fn, lemmatize_fn) if the WordNet corpus is usable."""
    try:
        from nltk.corpus import wordnet as wn
        from nltk.stem.wordnet import WordNetLemmatizer

        wn.synsets("run")  # force-load; raises LookupError w/o corpus files
        lem = WordNetLemmatizer()
        return (lambda w: wn.synsets(w), lambda w: lem.lemmatize(w, "v"))
    except Exception:
        return None


# --------------------------------------------------------------------------
# Embedded fallback: WordNet verb morphy
# --------------------------------------------------------------------------

# Irregular verb forms (subset of WordNet verb.exc relevant to action-class
# vocabulary; maps inflected form -> base form).
_VERB_EXC = {
    "ran": "run", "running": "run", "runs": "run",
    "swam": "swim", "swum": "swim", "swimming": "swim",
    "dove": "dive", "diving": "dive",
    "rode": "ride", "ridden": "ride", "riding": "ride",
    "threw": "throw", "thrown": "throw", "throwing": "throw",
    "drew": "draw", "drawn": "draw", "drawing": "draw",
    "blew": "blow", "blown": "blow", "blowing": "blow",
    "ate": "eat", "eaten": "eat", "eating": "eat",
    "drank": "drink", "drunk": "drink", "drinking": "drink",
    "sang": "sing", "sung": "sing", "singing": "sing",
    "dug": "dig", "digging": "dig",
    "cut": "cut", "cutting": "cut",
    "hit": "hit", "hitting": "hit",
    "sat": "sit", "sitting": "sit",
    "set": "set", "setting": "set",
    "got": "get", "gotten": "get", "getting": "get",
    "put": "put", "putting": "put",
    "shot": "shoot", "shooting": "shoot",
    "slid": "slide", "sliding": "slide",
    "spun": "spin", "spinning": "spin",
    "stood": "stand", "standing": "stand",
    "swung": "swing", "swinging": "swing",
    "wove": "weave", "woven": "weave", "weaving": "weave",
    "wrote": "write", "written": "write", "writing": "write",
    "made": "make", "making": "make",
    "rose": "rise", "risen": "rise", "rising": "rise",
    "fell": "fall", "fallen": "fall", "falling": "fall",
    "flew": "fly", "flown": "fly", "flying": "fly",
    "held": "hold", "holding": "hold",
    "knelt": "kneel", "kneeling": "kneel",
    "crept": "creep", "creeping": "creep",
    "leapt": "leap", "leaping": "leap",
    "slept": "sleep", "sleeping": "sleep",
    "swept": "sweep", "sweeping": "sweep",
    "wept": "weep", "weeping": "weep",
    "hung": "hang", "hanging": "hang",
    "dyeing": "dye", "dying": "die",
    "tying": "tie", "ty": "tie",
    "lying": "lie",
    "hopping": "hop", "hopped": "hop",
    "skipping": "skip", "skipped": "skip",
    "shopping": "shop", "shopped": "shop",
    "mopping": "mop", "mopped": "mop",
    "chopping": "chop", "chopped": "chop",
    "dropping": "drop", "dropped": "drop",
    "flipping": "flip", "flipped": "flip",
    "clapping": "clap", "clapped": "clap",
    "slapping": "slap", "slapped": "slap",
    "snapping": "snap", "snapped": "snap",
    "wrapping": "wrap", "wrapped": "wrap",
    "stepping": "step", "stepped": "step",
    "petting": "pet", "petted": "pet",
    "patting": "pat", "patted": "pat",
    "batting": "bat", "batted": "bat",
    "knitting": "knit", "knitted": "knit",
    "spitting": "spit", "spat": "spit",
    "jogging": "jog", "jogged": "jog",
    "hugging": "hug", "hugged": "hug",
    "tugging": "tug", "tugged": "tug",
    "digging": "dig", "dragging": "drag", "dragged": "drag",
    "begging": "beg", "begged": "beg",
    "grabbing": "grab", "grabbed": "grab",
    "stirring": "stir", "stirred": "stir",
    "strumming": "strum", "strummed": "strum",
    "drumming": "drum", "drummed": "drum",
    "humming": "hum", "hummed": "hum",
    "swimming": "swim",
    "trimming": "trim", "trimmed": "trim",
    "slamming": "slam", "slammed": "slam",
    "planning": "plan", "planned": "plan",
    "scanning": "scan", "scanned": "scan",
    "pinning": "pin", "pinned": "pin",
    "grinning": "grin", "grinned": "grin",
    "winning": "win", "won": "win",
    "spinning": "spin",
    "skidding": "skid",
    "nodding": "nod", "nodded": "nod",
    "bidding": "bid",
    "paddling": "paddle", "juggling": "juggle",
    "squatting": "squat", "squatted": "squat",
    "strutting": "strut",
    "rappelling": "rappel",
    "travelling": "travel", "traveling": "travel",
    "whipping": "whip", "whipped": "whip",
    "ripping": "rip", "ripped": "rip",
    "dipping": "dip", "dipped": "dip",
    "zipping": "zip", "zipped": "zip",
    "sipping": "sip", "sipped": "sip",
    "rubbing": "rub", "rubbed": "rub",
    "scrubbing": "scrub", "scrubbed": "scrub",
    "stabbing": "stab", "stabbed": "stab",
    "bobbing": "bob",
    "jabbing": "jab",
    "mowing": "mow", "mown": "mow",
    "sawing": "saw", "sawn": "saw",
    "sewing": "sew", "sewn": "sew",
    "bent": "bend", "bending": "bend",
    "built": "build", "building": "build",
    "bought": "buy", "buying": "buy",
    "caught": "catch", "catching": "catch",
    "taught": "teach", "teaching": "teach",
    "fought": "fight", "fighting": "fight",
    "brought": "bring", "bringing": "bring",
    "fed": "feed", "feeding": "feed",
    "led": "lead", "leading": "lead",
    "read": "read", "reading": "read",
    "rowed": "row", "rowing": "row",
    "said": "say", "saying": "say",
    "sold": "sell", "selling": "sell",
    "told": "tell", "telling": "tell",
    "went": "go", "gone": "go", "going": "go",
    "was": "be", "were": "be", "been": "be", "being": "be",
    "did": "do", "done": "do", "doing": "do",
    "seen": "see", "seeing": "see",
    "took": "take", "taken": "take", "taking": "take",
    "gave": "give", "given": "give", "giving": "give",
    "came": "come", "coming": "come",
    "found": "find", "finding": "find",
    "kept": "keep", "keeping": "keep",
    "left": "leave", "leaving": "leave",
    "lost": "lose", "losing": "lose",
    "meant": "mean", "meaning": "mean",
    "met": "meet", "meeting": "meet",
    "paid": "pay", "paying": "pay",
    "sent": "send", "sending": "send",
    "spent": "spend", "spending": "spend",
    "wore": "wear", "worn": "wear", "wearing": "wear",
    "woke": "wake", "woken": "wake", "waking": "wake",
    "broke": "break", "broken": "break", "breaking": "break",
    "chose": "choose", "chosen": "choose", "choosing": "choose",
    "froze": "freeze", "frozen": "freeze", "freezing": "freeze",
    "spoke": "speak", "spoken": "speak", "speaking": "speak",
    "stole": "steal", "stolen": "steal", "stealing": "steal",
    "strode": "stride", "striding": "stride",
    "struck": "strike", "striking": "strike",
    "bet": "bet", "betting": "bet",
    "shaved": "shave", "shaven": "shave", "shaving": "shave",
    "smoking": "smoke", "skating": "skate", "baking": "bake",
    "waving": "wave", "saving": "save", "carving": "carve",
    "serving": "serve", "surfing": "surf",
    "fencing": "fence", "dancing": "dance", "bouncing": "bounce",
    "racing": "race", "icing": "ice", "dicing": "dice", "slicing": "slice",
    "juicing": "juice",
}

# Base-form verbs that exist as WordNet verb lemmas, covering the action
# vocabulary of the supported datasets (every entry hand-checked to be a
# WordNet 3.0 verb lemma; tests/test_lemma_goldens.py pins the behavior on
# the full public class vocabularies in assets/class_vocab/).
_VERB_LEXICON = frozenset("""
abseil act adjust anchor answer applaud apply arch argue arrange arrest
assemble attend auction awake bag bake balance ball balloon band bandage
bar barbeque bartend bat bathe be beg belly bend bike bird blast blend blow
board bob boat bobsled
bottle bowl box braid branch break breakdance breathe brew bribe bring brush
bubble build bulldoze bump bungee burn burp bury busk bust buy calculate camp
candle canoe capsize card carry cart cartwheel carve cast catch celebrate
change chase chat check checker cheer cheerlead chew chip chisel chop clap
claw clean clear climb clip close clothe coach collect color comb come conga
contort cook cough count crack craft crawl crochet cross crunch cry cuddle
cup curl dance dart deal deck decorate deliver detect dice die dig dine dip
direct dish dive do dock dodge drag draw dress dribble drink drive drool drop
drum dry dunk dust dye eat egg embroider enter exercise extinguish eye face
fall feed felt fence fetch fidget fight fill film find finger fish fix flip
float flower fly fold fondle forage forge freeze fry game garden gargle get
give glass glide go golf grab grill grin grind groom guard gut gutter hammer
hand handle hang harvest hatch have head hear hedge helicopter herd hike hit
hold hoop hop hose huddle hug hula hum hunt hurdle hurl ice inflate install
interpret iron jack jaywalk jog juggle juice jump kayak keep kick kickbox
kiss kite knap knead kneel knit knock know knuckle lace land laugh launch lay
lead leap learn leave leg let lick lie lift light line listen live long look
lose lunge make marble march marinate massage meet milk mime mix moon mop
mosh motorcycle move mow nail nod open oyster pack paddle paint pan park
parkour pass pat pay peel perform pet photocopy photograph pick picnic pierce
pin pinch pipe pirouette pitch plan plant plaster plate play plow poach poke
pole polish pop post pour practice prepare present press pretend pull pump
punch push put question race raft raise rake rappel read receive record reel
remove repair rescue ride ring rinse rip roast rob rock roll rollerblade rope
row rub run sail salsa salute sand save saw say scallop scan scissor score
scramble scrape scrub scuba seal season seat see separate serve set sew shake
shape shark sharpen shave shear shine shoe shoot shop shovel show shred
shuck shuffle shut sieve sign sing sip sit skate skateboard sketch ski skid
skip skydive slack slam slap sled sleep slice slide sling smash smell smile
smoke snap snatch sneeze sniff snore snorkel snow snowball snowboard
snowmobile somersault sort speak spelunk spike spin spit splash spray spread
spring sprint squat squeeze stack stand staple stare start steal steer step
stick stir stomp stretch stride strike string strum strut stuff suck surf
survey swallow sweep swim swing tackle tag take talk tap tape taste
teach tear tell tend test testify text think thread throw thrust tickle tie
tile till tilt tiptoe tire toboggan toss train trade trap travel tread treat
tree trim trip try tube tumble turn tug twiddle twirl twist type unbox
uncork unload unpack up use vacuum vault visit wade wait wake walk wash
watch water waterski wave wax weave weld whip whistle win wind windsurf wink
wipe work wrap wrestle write yawn yell zip zumba bow bounce
""".split())

_VERB_RULES = (  # WordNet verb rules of detachment (suffix, replacement)
    ("s", ""),
    ("ies", "y"),
    ("es", "e"),
    ("es", ""),
    ("ed", "e"),
    ("ed", ""),
    ("ing", "e"),
    ("ing", ""),
)


def _candidates(word: str) -> List[str]:
    """Apply verb detachment rules (plus consonant un-doubling) once."""
    out = []
    for suf, rep in _VERB_RULES:
        if word.endswith(suf) and len(word) > len(suf):
            stem = word[: -len(suf)] + rep
            out.append(stem)
            # doubled final consonant: 'hopp' -> 'hop'
            if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
                out.append(stem[:-1])
    return out


def _fallback_base_verb(word: str) -> Optional[str]:
    """Return the base verb form if `word` looks like an (inflected) verb.

    Mirrors NLTK's WordNetLemmatizer.lemmatize(word, 'v') semantics:
    _morphy keeps the form itself (when it is a verb lemma) alongside the
    exception/rule candidates, and lemmatize picks the SHORTEST surviving
    candidate (ties -> first). The min-by-length step is observable on real
    class names — WordNet maps 'planing' to 'plan', not 'plane', because
    both detach and 'plan' is shorter."""
    if word in _VERB_EXC:
        cands = ([word] if word in _VERB_LEXICON else []) + [_VERB_EXC[word]]
        return min(cands, key=len)
    cands = [word] if word in _VERB_LEXICON else []
    cands += [c for c in _candidates(word) if c in _VERB_LEXICON]
    return min(cands, key=len) if cands else None


def verbs2basicform(words: Sequence[str]) -> List[str]:
    """Lemmatize each word to its base verb form iff it has a verb reading.

    Parity target: /root/reference/auxiliary/auxiliary_word2vec.py:212-219.
    """
    backend = _nltk_backend()
    ret = []
    for w in words:
        if backend is not None:
            synsets_fn, lemmatize_fn = backend
            if any(s.pos() == "v" for s in synsets_fn(w)):
                w = lemmatize_fn(w)
        else:
            base = _fallback_base_verb(w)
            if base is not None:
                w = base
        ret.append(w)
    return ret
