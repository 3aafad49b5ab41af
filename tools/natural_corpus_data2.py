"""Hand-authored extensions: multi-family facts for the natural corpus.

Round-4 review (VERDICT r4 weak #8 / item 5): the natural corpus was one
predicate family (creator-of-work -> birthplace) and too small to carry the
quality bar. This module extends every chain in natural_corpus_data.py with
additional hand-written biography sentences and question families over
them — award, employer/organization, education/institution, instrument,
and location facts — plus standalone distractor documents. As in the base
module, every sentence is written by hand about real-world entities; no
sentence templates, no generator frames.

Schema:
  EXTENSIONS[person] = {
    "extra_sents": [...],   # appended after the base person_sents
    "qa": [ {"answer_sid": i, "answer": str, "family": str,
             "questions": [...]} ],   # sid indexes base+extra person doc
  }
  NEW_CHAINS = [ {work, work_sents, link_sid, person, person_sents,
                  qa: [...]} ]        # chains for people not in the base
  DISTRACTOR_DOCS = {title: [sents]}  # pure filler documents
"""

EXTENSIONS = {
    "Steven Spielberg": {
        "extra_sents": [
            "For Schindler's List, Spielberg won the Academy Award in 1994.",
            "That same decade he co-founded the studio DreamWorks with two partners.",
            "Years after dropping out, he completed his film degree at California State University, Long Beach.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which award did the director of Jaws win for Schindler's List?",
                 "The director of Jaws won what award in 1994?",
                 "What prize was won by the filmmaker who directed Jaws for Schindler's List?",
             ]},
            {"answer_sid": 4, "answer": "DreamWorks", "family": "employer",
             "questions": [
                 "Which studio was co-founded by the director of Jaws?",
                 "The director of the film Jaws co-founded which studio?",
                 "What is the name of the studio that the filmmaker behind Jaws helped to found?",
             ]},
            {"answer_sid": 5, "answer": "California State University",
             "family": "education",
             "questions": [
                 "At which university did the director of Jaws complete his film degree?",
                 "The director of Jaws finished his degree at which university?",
                 "Which university awarded a film degree to the man who directed Jaws?",
             ]},
        ],
    },
    "Alfred Hitchcock": {
        "extra_sents": [
            "He began his film career designing title cards at the Famous Players-Lasky studio.",
            "Hitchcock was educated at St Ignatius College in London.",
            "In 1979 the American Film Institute honoured him with its Life Achievement Award.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Famous Players-Lasky",
             "family": "employer",
             "questions": [
                 "At which studio did the director of Psycho begin his career designing title cards?",
                 "The director of Psycho started out designing title cards for which studio?",
                 "Which studio first employed the man who directed Psycho?",
             ]},
            {"answer_sid": 4, "answer": "St Ignatius College",
             "family": "education",
             "questions": [
                 "At which college was the director of Psycho educated?",
                 "The director of Psycho was educated at which London college?",
                 "Which college educated the man who directed Rear Window?",
             ]},
            {"answer_sid": 5, "answer": "Life Achievement Award",
             "family": "award",
             "questions": [
                 "Which award did the American Film Institute give the director of Psycho in 1979?",
                 "In 1979 the director of Psycho was honoured with which award?",
                 "What award did the man who directed Rear Window receive from the American Film Institute?",
             ]},
        ],
    },
    "Akira Kurosawa": {
        "extra_sents": [
            "Kurosawa spent most of his career making films at the studio Toho.",
            "He accepted an honorary Academy Award for lifetime achievement in 1990.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Toho", "family": "employer",
             "questions": [
                 "At which studio did the director of Seven Samurai spend most of his career?",
                 "The director of Seven Samurai made most of his films for which studio?",
                 "Which studio employed the filmmaker behind Seven Samurai for most of his career?",
             ]},
            {"answer_sid": 4, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which honorary award did the director of Seven Samurai accept in 1990?",
                 "In 1990 the director of Seven Samurai accepted an honorary form of which award?",
                 "What award honoured the lifetime achievement of the man who directed Seven Samurai?",
             ]},
        ],
    },
    "Stanley Kubrick": {
        "extra_sents": [
            "Kubrick's only competitive Academy Award recognised the special effects of 2001.",
            "He settled at the Childwickbury Manor estate in Hertfordshire, England.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Look", "family": "employer",
             "questions": [
                 "For which magazine did the director of 2001: A Space Odyssey work as a photographer?",
                 "The director of 2001: A Space Odyssey started as a staff photographer for which magazine?",
                 "Which magazine employed the young Stanley Kubrick as a photographer?",
             ]},
            {"answer_sid": 3, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which award recognised the special effects of the film 2001: A Space Odyssey?",
                 "The special effects of 2001: A Space Odyssey earned its director which award?",
                 "What competitive award did the director of 2001: A Space Odyssey win for its effects?",
             ]},
        ],
    },
    "Ingmar Bergman": {
        "extra_sents": [
            "For years Bergman also served as director of the Royal Dramatic Theatre in Stockholm.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Royal Dramatic Theatre",
             "family": "employer",
             "questions": [
                 "Which theatre did the director of Persona lead in Stockholm?",
                 "The director of Persona served as director of which Stockholm theatre?",
                 "What theatre was led by the man who wrote and directed Persona?",
             ]},
            {"answer_sid": 2, "answer": "Fårö", "family": "location",
             "questions": [
                 "On which island did the director of Persona shoot much of his later work?",
                 "The director of Persona filmed much of his later work on which island?",
                 "Which island hosted the later productions of the filmmaker behind Persona?",
             ]},
        ],
    },
    "Federico Fellini": {
        "extra_sents": [
            "As a young man he drew cartoons for the satirical magazine Marc'Aurelio in Rome.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Marc'Aurelio", "family": "employer",
             "questions": [
                 "For which satirical magazine did the director of 8½ draw cartoons?",
                 "The director of 8½ drew cartoons for which magazine in Rome?",
                 "Which magazine published the early cartoons of the man who directed 8½?",
             ]},
            {"answer_sid": 2, "answer": "Academy Awards", "family": "award",
             "questions": [
                 "Which awards did the director of 8½ win five of?",
                 "The director of 8½ won five of which award?",
                 "What awards did the filmmaker behind 8½ collect five of in his career?",
             ]},
        ],
    },
    "Bong Joon-ho": {
        "extra_sents": [
            "He studied sociology at Yonsei University in Seoul.",
            "Bong won the Academy Award for Best Director in 2020.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Yonsei University",
             "family": "education",
             "questions": [
                 "At which university did the director of Parasite study sociology?",
                 "The director of Parasite studied sociology at which university?",
                 "Which university in Seoul educated the man who directed Parasite?",
             ]},
            {"answer_sid": 4, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which award did the director of Parasite win in 2020?",
                 "In 2020 the director of Parasite won which award for directing?",
                 "What award went to the filmmaker behind Parasite in 2020?",
             ]},
        ],
    },
    "Agnès Varda": {
        "extra_sents": [
            "She later served as the official photographer of the Théâtre National Populaire.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Théâtre National Populaire",
             "family": "employer",
             "questions": [
                 "For which theatre did the director of Cléo from 5 to 7 serve as official photographer?",
                 "The director of Cléo from 5 to 7 photographed for which theatre?",
                 "Which theatre employed the woman who directed Cléo from 5 to 7 as its photographer?",
             ]},
            {"answer_sid": 2, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which honorary award did the director of Cléo from 5 to 7 receive in 2017?",
                 "In 2017 the director of Cléo from 5 to 7 received an honorary form of which award?",
                 "What award did the woman who directed Cléo from 5 to 7 receive in 2017?",
             ]},
        ],
    },
    "Ernest Hemingway": {
        "extra_sents": [
            "After high school he reported for The Kansas City Star.",
            "He received the Nobel Prize in Literature in 1954.",
            "During the First World War he drove ambulances for the Red Cross in Italy.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "The Kansas City Star",
             "family": "employer",
             "questions": [
                 "For which newspaper did the author of The Old Man and the Sea report after high school?",
                 "The author of The Old Man and the Sea first reported for which newspaper?",
                 "Which newspaper employed the young author of The Old Man and the Sea?",
             ]},
            {"answer_sid": 4, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the author of The Old Man and the Sea receive in 1954?",
                 "The author of The Old Man and the Sea received which literary prize in 1954?",
                 "What prize in literature went to the man who wrote The Old Man and the Sea?",
             ]},
            {"answer_sid": 5, "answer": "Red Cross", "family": "organization",
             "questions": [
                 "For which organization did the author of The Old Man and the Sea drive ambulances?",
                 "The author of The Old Man and the Sea drove ambulances for which organization in Italy?",
                 "Which organization used the writer of The Old Man and the Sea as an ambulance driver?",
             ]},
        ],
    },
    "Gabriel García Márquez": {
        "extra_sents": [
            "As a young reporter he wrote for the Bogotá newspaper El Espectador.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the author of One Hundred Years of Solitude accept in 1982?",
                 "The author of One Hundred Years of Solitude accepted which literary prize?",
                 "What prize in literature went to the writer of One Hundred Years of Solitude?",
             ]},
            {"answer_sid": 3, "answer": "El Espectador", "family": "employer",
             "questions": [
                 "For which newspaper did the author of One Hundred Years of Solitude write as a reporter?",
                 "The author of One Hundred Years of Solitude wrote for which Bogotá newspaper?",
                 "Which newspaper published the young reporter who later wrote One Hundred Years of Solitude?",
             ]},
        ],
    },
    "Haruki Murakami": {
        "extra_sents": [
            "He studied drama at Waseda University in Tokyo.",
            "Before writing full-time he ran a jazz bar called Peter Cat.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Waseda University",
             "family": "education",
             "questions": [
                 "At which university did the author of Norwegian Wood study drama?",
                 "The author of Norwegian Wood studied drama at which university?",
                 "Which Tokyo university educated the writer of Norwegian Wood?",
             ]},
            {"answer_sid": 4, "answer": "Peter Cat", "family": "organization",
             "questions": [
                 "What was the name of the jazz bar run by the author of Norwegian Wood?",
                 "Before writing full-time, the author of Norwegian Wood ran a jazz bar named what?",
                 "The writer of Norwegian Wood ran which jazz bar before his literary career?",
             ]},
        ],
    },
    "Jane Austen": {
        "extra_sents": [
            "For the last years of her life she lived in the village of Chawton in Hampshire.",
            "Her brother arranged publication through the London house of Thomas Egerton.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Chawton", "family": "location",
             "questions": [
                 "In which village did the author of Pride and Prejudice spend her last years?",
                 "The author of Pride and Prejudice lived in which Hampshire village late in life?",
                 "Which village was home to the writer of Pride and Prejudice in her final years?",
             ]},
            {"answer_sid": 4, "answer": "Thomas Egerton",
             "family": "organization",
             "questions": [
                 "Through which London publisher was Pride and Prejudice's author first published?",
                 "The author of Pride and Prejudice was published through which London house?",
                 "Which publisher handled the books of the woman who wrote Pride and Prejudice?",
             ]},
        ],
    },
    "Toni Morrison": {
        "extra_sents": [
            "Morrison later taught writing at Princeton University.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize was the author of Beloved awarded in 1993?",
                 "The author of Beloved was awarded which literary prize in 1993?",
                 "What prize in literature was awarded to the woman who wrote Beloved?",
             ]},
            {"answer_sid": 0, "answer": "Random House", "family": "employer",
             "questions": [
                 "At which publishing house did the author of Beloved work as a senior editor?",
                 "The author of Beloved worked for years as an editor at which publisher?",
                 "Which publishing house employed the writer of Beloved as an editor?",
             ]},
            {"answer_sid": 3, "answer": "Princeton University",
             "family": "employer",
             "questions": [
                 "At which university did the author of Beloved teach writing?",
                 "The author of Beloved taught writing at which university?",
                 "Which university hired the writer of Beloved to teach writing?",
             ]},
        ],
    },
    "Fyodor Dostoevsky": {
        "extra_sents": [
            "He trained at the Military Engineering Academy in Saint Petersburg.",
            "For a mock execution and alleged sedition he was exiled to a prison camp in Siberia.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Military Engineering Academy",
             "family": "education",
             "questions": [
                 "At which academy did the author of Crime and Punishment train?",
                 "The author of Crime and Punishment trained at which academy in Saint Petersburg?",
                 "Which academy educated the man who wrote Crime and Punishment?",
             ]},
            {"answer_sid": 4, "answer": "Siberia", "family": "location",
             "questions": [
                 "To which region was the author of Crime and Punishment exiled?",
                 "The author of Crime and Punishment was exiled to a prison camp in which region?",
                 "Which region held the prison camp of the man who wrote Crime and Punishment?",
             ]},
        ],
    },
    "Albert Einstein": {
        "extra_sents": [
            "He received the Nobel Prize in Physics in 1921 for the photoelectric effect.",
            "From 1933 he worked at the Institute for Advanced Study in Princeton.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the creator of general relativity receive in 1921?",
                 "The physicist who created general relativity received which prize for the photoelectric effect?",
                 "What prize in physics went to the man who created general relativity?",
             ]},
            {"answer_sid": 2, "answer": "Princeton", "family": "location",
             "questions": [
                 "In which town did the creator of general relativity finally settle?",
                 "The physicist who created general relativity settled in which American town?",
                 "The man who created general relativity settled in which town after 1933?",
             ]},
            {"answer_sid": 1, "answer": "Bern", "family": "location",
             "questions": [
                 "In which city did the creator of general relativity examine patents?",
                 "The physicist who created general relativity worked as a patent examiner in which city?",
                 "Which city's patent office employed the man who created general relativity?",
             ]},
        ],
    },
    "Marie Curie": {
        "extra_sents": [
            "Curie received the Nobel Prize in Chemistry in 1911, her second Nobel.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Sorbonne", "family": "education",
             "questions": [
                 "At which institution did the discoverer of polonium study after moving to Paris?",
                 "The scientist who discovered polonium moved to Paris to study at which institution?",
                 "Which institution did the woman who discovered polonium move to Paris to study at?",
             ]},
            {"answer_sid": 3, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the discoverer of polonium receive in 1911?",
                 "The scientist who discovered polonium received which prize in chemistry in 1911?",
                 "What prize in chemistry went to the woman who discovered polonium?",
             ]},
        ],
    },
    "Charles Darwin": {
        "extra_sents": [
            "Darwin studied at Christ's College in Cambridge.",
            "The Royal Society recognised his work with the Copley Medal in 1864.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Christ's College",
             "family": "education",
             "questions": [
                 "At which college did the author of On the Origin of Species study?",
                 "The author of On the Origin of Species studied at which Cambridge college?",
                 "Which college educated the man who wrote On the Origin of Species?",
             ]},
            {"answer_sid": 4, "answer": "Copley Medal", "family": "award",
             "questions": [
                 "Which medal did the Royal Society give the author of On the Origin of Species?",
                 "The author of On the Origin of Species received which medal in 1864?",
                 "What medal recognised the work of the man who wrote On the Origin of Species?",
             ]},
            {"answer_sid": 1, "answer": "Beagle", "family": "organization",
             "questions": [
                 "Aboard which ship did the author of On the Origin of Species voyage for five years?",
                 "The author of On the Origin of Species made a five-year voyage aboard which ship?",
                 "Which ship's voyage supplied the observations behind On the Origin of Species?",
             ]},
        ],
    },
    "Alexander Fleming": {
        "extra_sents": [
            "Fleming spent his research career at St Mary's Hospital in London.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "St Mary's Hospital",
             "family": "employer",
             "questions": [
                 "At which hospital did the discoverer of penicillin spend his research career?",
                 "The discoverer of penicillin spent his career at which London hospital?",
                 "Which hospital hosted the research career of the man who discovered penicillin?",
             ]},
            {"answer_sid": 2, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the discoverer of penicillin share in 1945?",
                 "The discoverer of penicillin shared which prize in medicine?",
                 "What prize in medicine was shared by the man who discovered penicillin?",
             ]},
        ],
    },
    "Tim Berners-Lee": {
        "extra_sents": [
            "He proposed the web while working at a physics laboratory near Geneva.",
            "Berners-Lee studied physics at Queen's College in Oxford.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Geneva", "family": "location",
             "questions": [
                 "Near which city was the inventor of the World Wide Web working when he proposed it?",
                 "The inventor of the World Wide Web proposed it while working near which city?",
                 "The man who invented the World Wide Web worked at a laboratory near which city?",
             ]},
            {"answer_sid": 4, "answer": "Queen's College",
             "family": "education",
             "questions": [
                 "At which college did the inventor of the World Wide Web study physics?",
                 "The inventor of the World Wide Web studied physics at which Oxford college?",
                 "Which college educated the man who invented the World Wide Web?",
             ]},
        ],
    },
    "Nikola Tesla": {
        "extra_sents": [
            "On arriving in America he briefly worked for the Edison Machine Works in New York.",
            "He studied engineering at the polytechnic school in Graz.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Edison Machine Works",
             "family": "employer",
             "questions": [
                 "For which company did the inventor of the AC induction motor briefly work in New York?",
                 "The inventor of the AC induction motor worked for which company on arriving in America?",
                 "Which company first employed the man who invented the AC induction motor in New York?",
             ]},
            {"answer_sid": 4, "answer": "Graz", "family": "education",
             "questions": [
                 "In which city did the inventor of the AC induction motor study engineering?",
                 "The inventor of the AC induction motor studied at a polytechnic school in which city?",
                 "Which city's polytechnic school educated the man who invented the AC induction motor?",
             ]},
        ],
    },
    "Francis Crick": {
        "extra_sents": [
            "Crick shared the Nobel Prize in Physiology or Medicine in 1962.",
            "His double-helix work was done at the Cavendish Laboratory in Cambridge.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the co-discoverer of the double helix share in 1962?",
                 "The man who co-discovered the double helix shared which prize in medicine?",
                 "What prize in medicine went to the co-discoverer of the structure of DNA?",
             ]},
            {"answer_sid": 4, "answer": "Cavendish Laboratory",
             "family": "employer",
             "questions": [
                 "At which laboratory was the double helix structure worked out?",
                 "The co-discoverer of the double helix worked at which Cambridge laboratory?",
                 "Which laboratory hosted the DNA work of the man who co-discovered the double helix?",
             ]},
        ],
    },
    "Michael Jackson": {
        "extra_sents": [
            "The album's success brought him eight Grammy Awards in a single night in 1984.",
            "He began performing as the youngest member of the family group the Jackson Five.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Grammy Awards", "family": "award",
             "questions": [
                 "Which awards did the performer of Thriller win eight of in one night?",
                 "In 1984 the performer of Thriller won eight of which award?",
                 "What awards did the singer behind Thriller collect eight of in 1984?",
             ]},
            {"answer_sid": 4, "answer": "Jackson Five",
             "family": "organization",
             "questions": [
                 "In which family group did the performer of Thriller begin performing?",
                 "The performer of Thriller began performing as the youngest member of which group?",
                 "Which group did the singer behind Thriller begin performing with?",
             ]},
        ],
    },
    "John Lennon": {
        "extra_sents": [
            "He played rhythm guitar and shared lead vocals in the band.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Beatles", "family": "organization",
             "questions": [
                 "Which band did the writer of Imagine co-found with Paul McCartney?",
                 "The writer of Imagine co-founded which band?",
                 "What band was co-founded by the performer of Imagine?",
             ]},
            {"answer_sid": 3, "answer": "rhythm guitar",
             "family": "instrument",
             "questions": [
                 "Which instrument did the writer of Imagine play in his band?",
                 "The writer of Imagine played which instrument alongside his vocals?",
                 "What instrument did the performer of Imagine play in his famous band?",
             ]},
        ],
    },
    "Prince (musician)": {
        "extra_sents": [
            "The film that shares the album's name earned him an Academy Award for its song score.",
            "He recorded at his Paisley Park complex, which doubled as studio and home.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Academy Award", "family": "award",
             "questions": [
                 "Which award did the performer of Purple Rain earn for the film's song score?",
                 "The performer of Purple Rain earned which award for its score?",
                 "What award went to the musician behind Purple Rain for the film's music?",
             ]},
            {"answer_sid": 4, "answer": "Paisley Park",
             "family": "organization",
             "questions": [
                 "At which complex did the performer of Purple Rain record?",
                 "The performer of Purple Rain recorded at which complex?",
                 "What complex did the musician behind Purple Rain record at?",
             ]},
        ],
    },
    "Freddie Mercury": {
        "extra_sents": [
            "Mercury fronted the rock band Queen for two decades.",
            "He earned a diploma in graphic design at Ealing Art College in London.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Queen", "family": "organization",
             "questions": [
                 "Which band did the writer of Bohemian Rhapsody front for two decades?",
                 "The writer of Bohemian Rhapsody fronted which rock band?",
                 "What band was fronted by the singer who wrote Bohemian Rhapsody?",
             ]},
            {"answer_sid": 4, "answer": "Ealing Art College",
             "family": "education",
             "questions": [
                 "At which college did the writer of Bohemian Rhapsody study graphic design?",
                 "The writer of Bohemian Rhapsody earned a design diploma at which college?",
                 "Which London college educated the singer who wrote Bohemian Rhapsody?",
             ]},
        ],
    },
    "Bob Dylan": {
        "extra_sents": [
            "He played harmonica between verses at his concerts.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Nobel Prize", "family": "award",
             "questions": [
                 "Which prize did the writer of Like a Rolling Stone receive in 2016?",
                 "The writer of Like a Rolling Stone received which literary prize?",
                 "What prize in literature did the songwriter behind Like a Rolling Stone receive?",
             ]},
            {"answer_sid": 3, "answer": "harmonica", "family": "instrument",
             "questions": [
                 "Which instrument did the writer of Like a Rolling Stone play between verses?",
                 "The writer of Like a Rolling Stone played which instrument at his concerts?",
                 "What instrument did the songwriter behind Like a Rolling Stone play between verses?",
             ]},
        ],
    },
    "Franz Kafka": {
        "extra_sents": [
            "Kafka earned a law degree at Charles University in Prague.",
            "By day he handled claims at the Workers' Accident Insurance Institute.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Charles University",
             "family": "education",
             "questions": [
                 "At which university did the author of The Trial earn a law degree?",
                 "The author of The Trial earned a law degree at which university?",
                 "Which university granted a law degree to the man who wrote The Trial?",
             ]},
            {"answer_sid": 4, "answer": "Workers' Accident Insurance Institute",
             "family": "employer",
             "questions": [
                 "At which institute did the author of The Trial handle insurance claims?",
                 "The author of The Trial worked by day at which institute?",
                 "Which institute employed the man who wrote The Trial as a claims official?",
             ]},
        ],
    },
    "Antonio Vivaldi": {
        "extra_sents": [
            "He taught generations of orphan girls to play the violin.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "violin", "family": "instrument",
             "questions": [
                 "Which instrument did the composer of The Four Seasons teach the orphan girls to play?",
                 "The composer of The Four Seasons taught the girls to play which instrument?",
                 "What instrument did the man who composed The Four Seasons teach the girls to play?",
             ]},
            {"answer_sid": 2, "answer": "Vienna", "family": "location",
             "questions": [
                 "The composer of The Four Seasons died poor in which city?",
                 "In which city did the composer of The Four Seasons die poor?",
                 "Which city saw the composer of The Four Seasons die poor in 1741?",
             ]},
        ],
    },
    "Pablo Picasso": {
        "extra_sents": [
            "He trained at the Royal Academy of San Fernando in Madrid before abandoning formal study.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Cubism", "family": "organization",
             "questions": [
                 "Which movement did the painter of Guernica develop with Georges Braque?",
                 "The painter of Guernica developed which movement in Paris?",
                 "What artistic movement was developed by the man who painted Guernica?",
             ]},
            {"answer_sid": 3, "answer": "Royal Academy",
             "family": "education",
             "questions": [
                 "At which academy did the painter of Guernica train in Madrid?",
                 "The painter of Guernica trained at which Madrid academy?",
                 "Which academy trained the man who painted Guernica?",
             ]},
        ],
    },
    "Vincent van Gogh": {
        "extra_sents": [
            "As a young man he worked for the art dealership Goupil in The Hague.",
            "He spent his final months in the village of Auvers-sur-Oise, north of Paris.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Goupil", "family": "employer",
             "questions": [
                 "For which art dealership did the painter of The Starry Night work as a young man?",
                 "The painter of The Starry Night worked for which dealership in The Hague?",
                 "Which dealership employed the young man who later painted The Starry Night?",
             ]},
            {"answer_sid": 4, "answer": "Auvers-sur-Oise",
             "family": "location",
             "questions": [
                 "In which village did the painter of The Starry Night spend his final months?",
                 "The painter of The Starry Night spent his final months in which village?",
                 "Which village north of Paris hosted the final months of the man who painted The Starry Night?",
             ]},
        ],
    },
    "Salvador Dalí": {
        "extra_sents": [
            "He collaborated with the filmmaker Luis Buñuel on an early surrealist film.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Luis Buñuel",
             "family": "organization",
             "questions": [
                 "With which filmmaker did the painter of The Persistence of Memory collaborate on a film?",
                 "The painter of The Persistence of Memory collaborated with which filmmaker?",
                 "Which filmmaker collaborated on a film with the man who painted The Persistence of Memory?",
             ]},
        ],
    },
    "Johannes Vermeer": {
        "extra_sents": [
            "He used the costly pigment ultramarine in his blues.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "ultramarine",
             "family": "instrument",
             "questions": [
                 "Which pigment did the painter of Girl with a Pearl Earring use for his blues?",
                 "The painter of Girl with a Pearl Earring used which costly pigment?",
                 "What pigment gave the blues of the man who painted Girl with a Pearl Earring?",
             ]},
        ],
    },
    "Antoni Gaudí": {
        "qa": [
            {"answer_sid": 1, "answer": "Barcelona", "family": "location",
             "questions": [
                 "Nearly all the built work of the Sagrada Família's architect stands in which city?",
                 "The architect of the Sagrada Família built nearly all of his work in and around which city?",
                 "Which city holds nearly all the built work of the man behind the Sagrada Família?",
             ]},
        ],
    },
    "Frank Lloyd Wright": {
        "extra_sents": [
            "Wright founded the Taliesin Fellowship to train apprentices at his Wisconsin estate.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Taliesin Fellowship",
             "family": "organization",
             "questions": [
                 "Which fellowship did the architect of Fallingwater found to train apprentices?",
                 "The architect of Fallingwater founded which fellowship?",
                 "What fellowship was founded by the man who designed Fallingwater?",
             ]},
            {"answer_sid": 2, "answer": "The Guggenheim Museum",
             "family": "location",
             "questions": [
                 "What was the last major work of the architect of Fallingwater?",
                 "The architect of Fallingwater finished his career with the spiral of which museum?",
                 "Which museum's spiral was the last major work of the man who designed Fallingwater?",
             ]},
        ],
    },
    "Jørn Utzon": {
        "extra_sents": [
            "Utzon trained as an architect at the Royal Danish Academy in Copenhagen.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Pritzker Prize", "family": "award",
             "questions": [
                 "Which prize did the designer of the Sydney Opera House receive in 2003?",
                 "The designer of the Sydney Opera House received which prize in 2003?",
                 "What prize went to the architect behind the Sydney Opera House in 2003?",
             ]},
            {"answer_sid": 3, "answer": "Royal Danish Academy",
             "family": "education",
             "questions": [
                 "At which academy did the designer of the Sydney Opera House train?",
                 "The designer of the Sydney Opera House trained at which academy?",
                 "Which academy trained the architect behind the Sydney Opera House?",
             ]},
        ],
    },
    "Alexey Pajitnov": {
        "extra_sents": [
            "Pajitnov built the game at the Dorodnicyn Computing Centre of the Soviet Academy of Sciences.",
            "He emigrated to the United States in 1991.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Dorodnicyn Computing Centre",
             "family": "employer",
             "questions": [
                 "At which computing centre did the creator of Tetris build his game?",
                 "The creator of Tetris built his game at which computing centre?",
                 "Which computing centre hosted the man who created Tetris?",
             ]},
            {"answer_sid": 4, "answer": "United States",
             "family": "location",
             "questions": [
                 "To which country did the creator of Tetris emigrate in 1991?",
                 "The creator of Tetris emigrated to which country?",
                 "Which country did the man who created Tetris emigrate to in 1991?",
             ]},
        ],
    },
    "Shigeru Miyamoto": {
        "extra_sents": [
            "He studied industrial design at Kanazawa College of Art.",
        ],
        "qa": [
            {"answer_sid": 1, "answer": "Nintendo", "family": "employer",
             "questions": [
                 "Which company did the designer of Super Mario Bros. join as its first staff artist?",
                 "The designer of Super Mario Bros. joined which company as a staff artist?",
                 "What company did the man who designed Super Mario Bros. join?",
             ]},
            {"answer_sid": 3, "answer": "Kanazawa College",
             "family": "education",
             "questions": [
                 "At which college did the designer of Super Mario Bros. study industrial design?",
                 "The designer of Super Mario Bros. studied industrial design at which college?",
                 "Which college taught industrial design to the man behind Super Mario Bros.?",
             ]},
        ],
    },
    "Henry Ford": {
        "qa": [
            {"answer_sid": 1, "answer": "Edison Illuminating Company",
             "family": "employer",
             "questions": [
                 "For which company did the creator of the Model T work as an engineer?",
                 "The creator of the Model T worked as an engineer for which company?",
                 "Which company employed the man behind the Model T as an engineer?",
             ]},
        ],
    },
    "Steve Jobs": {
        "extra_sents": [
            "After leaving, he started the computer maker NeXT and bought the animation studio Pixar.",
        ],
        "qa": [
            {"answer_sid": 1, "answer": "Apple", "family": "organization",
             "questions": [
                 "Which company did the creator of the Macintosh co-found in a garage?",
                 "The creator of the Macintosh co-founded which company in his family's garage?",
                 "What company was co-founded in a garage by the man behind the Macintosh?",
             ]},
            {"answer_sid": 3, "answer": "Pixar", "family": "acquisition",
             "questions": [
                 "Which animation studio did the creator of the Macintosh buy?",
                 "The creator of the Macintosh bought which animation studio?",
                 "What studio did the man behind the Macintosh buy after leaving?",
             ]},
        ],
    },
    "Thor Heyerdahl": {
        "extra_sents": [
            "He studied zoology at the university in Oslo before the expedition.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Oslo", "family": "education",
             "questions": [
                 "In which city did the leader of the Kon-Tiki expedition study zoology?",
                 "The leader of the Kon-Tiki expedition studied zoology in which city?",
                 "Which city's university taught zoology to the man who led the Kon-Tiki expedition?",
             ]},
        ],
    },
    "Neil Armstrong": {
        "extra_sents": [
            "He flew the X-15 rocket plane as a test pilot at Edwards Air Force Base.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Cincinnati", "family": "employer",
             "questions": [
                 "In which city did the commander of Apollo 11 teach aerospace engineering?",
                 "The commander of Apollo 11 taught aerospace engineering in which city?",
                 "Which city's university hired the commander of Apollo 11 to teach aerospace engineering?",
             ]},
            {"answer_sid": 3, "answer": "Edwards Air Force Base",
             "family": "organization",
             "questions": [
                 "At which base did the commander of Apollo 11 fly as a test pilot?",
                 "The commander of Apollo 11 flew rocket planes at which base?",
                 "Which base hosted the test flights of the man who commanded Apollo 11?",
             ]},
        ],
    },
    "Stephen Jay Gould": {
        "extra_sents": [
            "Gould taught paleontology at Harvard University for most of his career.",
        ],
        "qa": [
            {"answer_sid": 2, "answer": "Natural History",
             "family": "organization",
             "questions": [
                 "In which magazine did the proposer of punctuated equilibrium run his monthly essays?",
                 "The proposer of punctuated equilibrium ran monthly essays in which magazine?",
                 "Which magazine ran the monthly essays of the man who proposed punctuated equilibrium?",
             ]},
            {"answer_sid": 3, "answer": "Harvard University",
             "family": "employer",
             "questions": [
                 "At which university did the proposer of punctuated equilibrium teach paleontology?",
                 "The proposer of punctuated equilibrium taught paleontology at which university?",
                 "Which university employed the man who proposed punctuated equilibrium?",
             ]},
        ],
    },
    "Lin-Manuel Miranda": {
        "extra_sents": [
            "Hamilton earned him the Pulitzer Prize for Drama in 2016.",
            "Miranda studied theatre at Wesleyan University in Connecticut.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Pulitzer Prize", "family": "award",
             "questions": [
                 "Which prize did the creator of Hamilton earn in 2016?",
                 "The creator of Hamilton earned which prize for drama?",
                 "What prize did the man who created Hamilton earn in 2016?",
             ]},
            {"answer_sid": 4, "answer": "Wesleyan University",
             "family": "education",
             "questions": [
                 "At which university did the creator of Hamilton study theatre?",
                 "The creator of Hamilton studied theatre at which university?",
                 "Which Connecticut university taught theatre to the man who created Hamilton?",
             ]},
        ],
    },
    "Mary Shelley": {
        "qa": [
            {"answer_sid": 0, "answer": "Mary Wollstonecraft",
             "family": "organization",
             "questions": [
                 "Who was the mother of the author of Frankenstein?",
                 "The author of Frankenstein was the daughter of which philosopher mother?",
                 "Which philosopher was the mother of the woman who wrote Frankenstein?",
             ]},
            {"answer_sid": 1, "answer": "Percy Shelley",
             "family": "organization",
             "questions": [
                 "The author of Frankenstein eloped to the Continent with which poet?",
                 "With which poet did the author of Frankenstein elope to the Continent?",
                 "Which poet eloped to the Continent with the woman who wrote Frankenstein?",
             ]},
        ],
    },
    "Claude Debussy": {
        "extra_sents": [
            "Debussy entered the Paris Conservatoire at the age of ten.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Paris Conservatoire",
             "family": "education",
             "questions": [
                 "Which conservatoire did the composer of Clair de lune enter at the age of ten?",
                 "The composer of Clair de lune entered which conservatoire as a boy?",
                 "What conservatoire admitted the ten-year-old who later composed Clair de lune?",
             ]},
        ],
    },
    "Leo Tolstoy": {
        "qa": [
            {"answer_sid": 1, "answer": "Sevastopol", "family": "location",
             "questions": [
                 "At the siege of which city did the author of War and Peace serve as an artillery officer?",
                 "The author of War and Peace served as an artillery officer at the siege of which city?",
                 "Which city's siege saw the author of War and Peace as an artillery officer?",
             ]},
        ],
    },
    "Pyotr Tchaikovsky": {
        "extra_sents": [
            "He trained at the Saint Petersburg Conservatory under Anton Rubinstein.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Saint Petersburg Conservatory",
             "family": "education",
             "questions": [
                 "At which conservatory did the composer of The Nutcracker train?",
                 "The composer of The Nutcracker trained at which conservatory?",
                 "Which conservatory trained the man who composed The Nutcracker?",
             ]},
        ],
    },
    "Stephen Hawking": {
        "extra_sents": [
            "Hawking taught mathematics at the university in Cambridge for thirty years.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Cambridge", "family": "employer",
             "questions": [
                 "In which city did the author of A Brief History of Time teach for thirty years?",
                 "The author of A Brief History of Time taught for thirty years at which university town?",
                 "Which university town employed the man who wrote A Brief History of Time?",
             ]},
        ],
    },
    "Simone de Beauvoir": {
        "extra_sents": [
            "After the war she edited the journal Les Temps Modernes with Sartre.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "Les Temps Modernes",
             "family": "organization",
             "questions": [
                 "Which journal did the author of The Second Sex edit after the war?",
                 "The author of The Second Sex edited which journal with Sartre?",
                 "What journal was edited by the woman who wrote The Second Sex?",
             ]},
        ],
    },
    "Rachel Carson": {
        "extra_sents": [
            "Her book The Sea Around Us won the National Book Award in 1952.",
        ],
        "qa": [
            {"answer_sid": 3, "answer": "National Book Award",
             "family": "award",
             "questions": [
                 "Which award did the author of Silent Spring win for The Sea Around Us?",
                 "The author of Silent Spring won which award in 1952?",
                 "What award went to the woman who wrote Silent Spring for her sea book?",
             ]},
        ],
    },
}

NEW_CHAINS = [
    {
        "work": "What a Wonderful World",
        "work_sents": [
            "What a Wonderful World is a 1967 ballad celebrating everyday beauty.",
            "It was recorded by the jazz singer and trumpeter Louis Armstrong late in his career.",
            "The song topped the British charts and became a standard.",
        ],
        "link_sid": 1,
        "person": "Louis Armstrong",
        "person_sents": [
            "Louis Armstrong was born in New Orleans in 1901 and grew up in deep poverty.",
            "He played the trumpet with a joyful, gravelly phrasing that reshaped jazz.",
            "Fans knew him by the nickname Satchmo.",
            "He led his band the All Stars for the last quarter-century of his life.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "New Orleans", "family": "birthplace",
             "questions": [
                 "In which city was the performer of What a Wonderful World born?",
                 "Where was the singer of What a Wonderful World born?",
                 "What is the birthplace of the trumpeter who recorded What a Wonderful World?",
             ]},
            {"answer_sid": 1, "answer": "trumpet", "family": "instrument",
             "questions": [
                 "Which instrument did the performer of What a Wonderful World play?",
                 "The singer of What a Wonderful World played which instrument?",
                 "What instrument was played by the man who recorded What a Wonderful World?",
             ]},
            {"answer_sid": 2, "answer": "Satchmo", "family": "organization",
             "questions": [
                 "By which nickname was the performer of What a Wonderful World known?",
                 "The singer of What a Wonderful World was known by which nickname?",
                 "What nickname did the man who recorded What a Wonderful World go by?",
             ]},
        ],
    },
    {
        "work": "The Two Fridas",
        "work_sents": [
            "The Two Fridas is a double self-portrait painted in 1939.",
            "Frida Kahlo painted it during her divorce, showing two selves with joined hands.",
            "The exposed hearts of both figures are connected by a single vein.",
        ],
        "link_sid": 1,
        "person": "Frida Kahlo",
        "person_sents": [
            "Frida Kahlo was born in Coyoacán, on the edge of Mexico City, in 1907.",
            "She married the muralist Diego Rivera in 1929.",
            "She lived most of her life in the Casa Azul, her family home.",
            "A bus accident at eighteen left her in lifelong pain and turned her to painting.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Coyoacán", "family": "birthplace",
             "questions": [
                 "Where was the painter of The Two Fridas born?",
                 "In which part of Mexico City was the painter of The Two Fridas born?",
                 "What is the birthplace of the woman who painted The Two Fridas?",
             ]},
            {"answer_sid": 1, "answer": "Diego Rivera",
             "family": "organization",
             "questions": [
                 "Which muralist did the painter of The Two Fridas marry?",
                 "The painter of The Two Fridas married which muralist in 1929?",
                 "What muralist married the woman who painted The Two Fridas?",
             ]},
            {"answer_sid": 2, "answer": "Casa Azul", "family": "location",
             "questions": [
                 "In which family home did the painter of The Two Fridas live most of her life?",
                 "The painter of The Two Fridas lived in which famous blue house?",
                 "Where did the woman who painted The Two Fridas live most of her life?",
             ]},
        ],
    },
    {
        "work": "Principia Mathematica (Newton)",
        "work_sents": [
            "The Principia set out the laws of motion and universal gravitation in 1687.",
            "Isaac Newton wrote it in Latin over eighteen months of intense work.",
            "The book was seen through the press at the expense of Edmond Halley.",
        ],
        "link_sid": 1,
        "person": "Isaac Newton",
        "person_sents": [
            "Isaac Newton was born at Woolsthorpe, a manor farm in Lincolnshire, in 1642.",
            "Newton studied at Trinity College in Cambridge.",
            "Late in life he ran the Royal Mint in London.",
            "He served for decades as president of the Royal Society.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Woolsthorpe", "family": "birthplace",
             "questions": [
                 "Where was the author of the Principia born?",
                 "At which manor farm was the author of the Principia born?",
                 "What is the birthplace of the man who wrote the Principia?",
             ]},
            {"answer_sid": 1, "answer": "Trinity College",
             "family": "education",
             "questions": [
                 "At which college did the author of the Principia study?",
                 "The author of the Principia studied at which Cambridge college?",
                 "Which college educated the man who wrote the Principia?",
             ]},
            {"answer_sid": 2, "answer": "Royal Mint", "family": "employer",
             "questions": [
                 "Which mint did the author of the Principia run late in life?",
                 "Late in life the author of the Principia ran which institution in London?",
                 "What mint was run by the man who wrote the Principia?",
             ]},
            {"answer_sid": 3, "answer": "Royal Society",
             "family": "organization",
             "questions": [
                 "Of which society was the author of the Principia president?",
                 "The author of the Principia served as president of which society?",
                 "Which society had the man who wrote the Principia as its president?",
             ]},
        ],
    },
    {
        "work": "Nineteen Eighty-Four",
        "work_sents": [
            "Nineteen Eighty-Four imagines a total surveillance state ruled by Big Brother.",
            "George Orwell finished the novel on the remote island of Jura while gravely ill.",
            "It was published in 1949, months before its author's death.",
        ],
        "link_sid": 1,
        "person": "George Orwell",
        "person_sents": [
            "George Orwell was born Eric Blair in Motihari, in British India, in 1903.",
            "He wrote a regular column for the magazine Tribune.",
            "He fought for the republican side in the Spanish Civil War and was shot through the throat.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Motihari", "family": "birthplace",
             "questions": [
                 "Where was the author of Nineteen Eighty-Four born?",
                 "In which Indian town was the author of Nineteen Eighty-Four born?",
                 "What is the birthplace of the man who wrote Nineteen Eighty-Four?",
             ]},
            {"answer_sid": 1, "answer": "Tribune", "family": "employer",
             "questions": [
                 "For which magazine did the author of Nineteen Eighty-Four write a regular column?",
                 "The author of Nineteen Eighty-Four wrote a column for which magazine?",
                 "Which magazine carried the regular column of the man who wrote Nineteen Eighty-Four?",
             ]},
            {"answer_sid": 2, "answer": "Spanish Civil War",
             "family": "location",
             "questions": [
                 "In which war was the author of Nineteen Eighty-Four shot through the throat?",
                 "The author of Nineteen Eighty-Four fought in which war?",
                 "Which war wounded the man who wrote Nineteen Eighty-Four?",
             ]},
        ],
    },
    {
        "work": "Telephone (invention)",
        "work_sents": [
            "The telephone turned speech into electrical signals carried along a wire.",
            "Alexander Graham Bell was granted the decisive patent in March 1876.",
            "Within a decade exchanges connected subscribers across whole cities.",
        ],
        "link_sid": 1,
        "person": "Alexander Graham Bell",
        "person_sents": [
            "Alexander Graham Bell was born in Edinburgh in 1847 into a family of elocution teachers.",
            "Bell taught speech at Boston University.",
            "He helped establish the Bell Telephone Company in 1877.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Edinburgh", "family": "birthplace",
             "questions": [
                 "Where was the inventor of the telephone born?",
                 "In which Scottish city was the inventor of the telephone born?",
                 "What is the birthplace of the man who invented the telephone?",
             ]},
            {"answer_sid": 1, "answer": "Boston University",
             "family": "employer",
             "questions": [
                 "At which university did the inventor of the telephone teach speech?",
                 "The inventor of the telephone taught speech at which university?",
                 "Which university employed the man who invented the telephone as a speech teacher?",
             ]},
            {"answer_sid": 2, "answer": "Bell Telephone Company",
             "family": "organization",
             "questions": [
                 "Which company did the inventor of the telephone help establish in 1877?",
                 "The inventor of the telephone helped establish which company?",
                 "What company was established with the help of the man who invented the telephone?",
             ]},
        ],
    },
    {
        "work": "The Magic Flute",
        "work_sents": [
            "The Magic Flute is a singspiel opera that premiered in Vienna in 1791.",
            "Wolfgang Amadeus Mozart composed it in the final year of his life.",
            "Its Queen of the Night aria is among the most demanding in the repertoire.",
        ],
        "link_sid": 1,
        "person": "Wolfgang Amadeus Mozart",
        "person_sents": [
            "Wolfgang Amadeus Mozart was born in Salzburg in 1756.",
            "He toured the courts of Europe as a child prodigy with his sister.",
            "He left the archbishop's service and moved to Vienna to work freelance.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Salzburg", "family": "birthplace",
             "questions": [
                 "Where was the composer of The Magic Flute born?",
                 "In which city was the composer of The Magic Flute born?",
                 "What is the birthplace of the man who composed The Magic Flute?",
             ]},
            {"answer_sid": 2, "answer": "Vienna", "family": "location",
             "questions": [
                 "To which city did the composer of The Magic Flute move to work freelance?",
                 "The composer of The Magic Flute moved to which city?",
                 "Which city did the man who composed The Magic Flute move to after leaving the archbishop's service?",
             ]},
        ],
    },
    {
        "work": "Long Walk to Freedom",
        "work_sents": [
            "Long Walk to Freedom is an autobiography published in 1994.",
            "Nelson Mandela began writing it secretly in prison on Robben Island.",
            "The manuscript was hidden in the prison garden and smuggled out in pieces.",
        ],
        "link_sid": 1,
        "person": "Nelson Mandela",
        "person_sents": [
            "Nelson Mandela was born in the village of Mvezo on the Mbashe River in 1918.",
            "He spent eighteen of his prison years on Robben Island.",
            "He shared the Nobel Peace Prize in 1993.",
            "In 1994 he was elected president of South Africa.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Mvezo", "family": "birthplace",
             "questions": [
                 "In which village was the author of Long Walk to Freedom born?",
                 "Where was the author of Long Walk to Freedom born?",
                 "What is the birthplace of the man who wrote Long Walk to Freedom?",
             ]},
            {"answer_sid": 2, "answer": "Nobel Peace Prize",
             "family": "award",
             "questions": [
                 "Which prize did the author of Long Walk to Freedom share in 1993?",
                 "The author of Long Walk to Freedom shared which prize?",
                 "What prize was shared by the man who wrote Long Walk to Freedom?",
             ]},
            {"answer_sid": 3, "answer": "South Africa",
             "family": "location",
             "questions": [
                 "Of which country was the author of Long Walk to Freedom elected president?",
                 "The author of Long Walk to Freedom became president of which country?",
                 "Which country elected the man who wrote Long Walk to Freedom as president?",
             ]},
        ],
    },
    {
        "work": "Periodic table of the elements",
        "work_sents": [
            "The periodic table arranges the chemical elements by recurring properties.",
            "Dmitri Mendeleev published the first widely accepted version in 1869.",
            "Gaps in his table correctly predicted elements not yet discovered.",
        ],
        "link_sid": 1,
        "person": "Dmitri Mendeleev",
        "person_sents": [
            "Dmitri Mendeleev was born in Tobolsk, in Siberia, in 1834, the youngest of a large family.",
            "He taught chemistry at Saint Petersburg University for over twenty years.",
            "Legend says the arrangement of the elements came to him in a dream.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Tobolsk", "family": "birthplace",
             "questions": [
                 "Where was the creator of the periodic table born?",
                 "In which Siberian town was the creator of the periodic table born?",
                 "What is the birthplace of the man who created the periodic table?",
             ]},
            {"answer_sid": 1, "answer": "Saint Petersburg University",
             "family": "employer",
             "questions": [
                 "At which university did the creator of the periodic table teach chemistry?",
                 "The creator of the periodic table taught chemistry at which university?",
                 "Which university employed the man who created the periodic table?",
             ]},
        ],
    },
    {
        "work": "Kind of Blue",
        "work_sents": [
            "Kind of Blue, recorded in 1959, is the best-selling jazz album ever made.",
            "The trumpeter Miles Davis assembled a sextet and sketched the modal themes just before the sessions.",
            "Most tracks were captured in single takes.",
        ],
        "link_sid": 1,
        "person": "Miles Davis",
        "person_sents": [
            "Miles Davis was born in Alton, Illinois, in 1926, and grew up in East St. Louis.",
            "He enrolled at the Juilliard School in New York but left for the clubs.",
            "Davis played the trumpet with a distinctive muted tone.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Alton", "family": "birthplace",
             "questions": [
                 "Where was the trumpeter behind Kind of Blue born?",
                 "In which Illinois town was the leader of the Kind of Blue sessions born?",
                 "What is the birthplace of the man who made Kind of Blue?",
             ]},
            {"answer_sid": 1, "answer": "Juilliard School",
             "family": "education",
             "questions": [
                 "At which school did the trumpeter behind Kind of Blue enrol in New York?",
                 "The leader of the Kind of Blue sessions enrolled at which school?",
                 "Which school admitted the man who made Kind of Blue before he left for the clubs?",
             ]},
            {"answer_sid": 2, "answer": "trumpet", "family": "instrument",
             "questions": [
                 "Which instrument did the leader of the Kind of Blue sessions play?",
                 "The man behind Kind of Blue played which instrument?",
                 "What instrument was played by the leader of the Kind of Blue sessions?",
             ]},
        ],
    },
    {
        "work": "The Hobbit",
        "work_sents": [
            "The Hobbit follows Bilbo Baggins on an unexpected journey to a dragon's hoard.",
            "J.R.R. Tolkien wrote it for his children, and it was published in 1937.",
            "Its success led a publisher to ask for the sequel that became The Lord of the Rings.",
        ],
        "link_sid": 1,
        "person": "J.R.R. Tolkien",
        "person_sents": [
            "J.R.R. Tolkien was born in Bloemfontein, in what is now South Africa, in 1892.",
            "Tolkien taught Anglo-Saxon at Oxford for decades.",
            "He read drafts aloud to a circle of friends called the Inklings.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Bloemfontein",
             "family": "birthplace",
             "questions": [
                 "Where was the author of The Hobbit born?",
                 "In which city was the author of The Hobbit born?",
                 "What is the birthplace of the man who wrote The Hobbit?",
             ]},
            {"answer_sid": 1, "answer": "Oxford", "family": "employer",
             "questions": [
                 "In which city did the author of The Hobbit teach Anglo-Saxon?",
                 "The author of The Hobbit taught Anglo-Saxon at which university town?",
                 "Which university town employed the man who wrote The Hobbit?",
             ]},
            {"answer_sid": 2, "answer": "Inklings", "family": "organization",
             "questions": [
                 "To which circle of friends did the author of The Hobbit read drafts aloud?",
                 "The author of The Hobbit read drafts to a circle called what?",
                 "What was the name of the circle that heard the drafts of the man who wrote The Hobbit?",
             ]},
        ],
    },
    {
        "work": "Dynamite",
        "work_sents": [
            "Dynamite made nitroglycerine safe enough to handle and transport.",
            "Alfred Nobel patented the explosive in 1867 after years of dangerous experiments.",
            "It transformed mining, tunnelling, and construction within a generation.",
        ],
        "link_sid": 1,
        "person": "Alfred Nobel",
        "person_sents": [
            "Alfred Nobel was born in Stockholm in 1833.",
            "He built his first explosives factory at Vinterviken outside Stockholm.",
            "His will endowed the annual prizes that carry his name.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "Stockholm", "family": "birthplace",
             "questions": [
                 "Where was the inventor of dynamite born?",
                 "In which city was the inventor of dynamite born?",
                 "What is the birthplace of the man who invented dynamite?",
             ]},
            {"answer_sid": 1, "answer": "Vinterviken", "family": "location",
             "questions": [
                 "Where did the inventor of dynamite build his first explosives factory?",
                 "The inventor of dynamite built his first factory at which site?",
                 "At which site outside Stockholm did the man who invented dynamite build his factory?",
             ]},
        ],
    },
    {
        "work": "Gombe chimpanzee study",
        "work_sents": [
            "The long-term chimpanzee study at Gombe Stream began in 1960.",
            "Jane Goodall started it by observing tool use among wild chimpanzees.",
            "It continues today as one of the longest wildlife studies anywhere.",
        ],
        "link_sid": 1,
        "person": "Jane Goodall",
        "person_sents": [
            "Jane Goodall was born in London in 1934 and grew up near the sea in Bournemouth.",
            "The palaeontologist Louis Leakey sent her to observe chimpanzees in 1960.",
            "Her institute now runs conservation programmes on several continents.",
        ],
        "qa": [
            {"answer_sid": 0, "answer": "London", "family": "birthplace",
             "questions": [
                 "Where was the founder of the Gombe chimpanzee study born?",
                 "In which city was the founder of the Gombe chimpanzee study born?",
                 "What is the birthplace of the woman who began the Gombe chimpanzee study?",
             ]},
            {"answer_sid": 1, "answer": "Louis Leakey",
             "family": "organization",
             "questions": [
                 "Which palaeontologist sent the founder of the Gombe chimpanzee study to observe chimpanzees?",
                 "The founder of the Gombe chimpanzee study was sent to Africa by which palaeontologist?",
                 "What palaeontologist sent the woman behind the Gombe chimpanzee study to the field?",
             ]},
        ],
    },
]

DISTRACTOR_DOCS = {
    "Amazon River": [
        "The Amazon River discharges more water than the next seven largest rivers combined.",
        "Its basin drains roughly forty percent of South America.",
        "During the wet season parts of the river exceed fifty kilometres in width.",
        "No bridge crosses its main stem along the entire length.",
    ],
    "Great Barrier Reef": [
        "The Great Barrier Reef stretches over two thousand kilometres off the coast of Queensland.",
        "It is the largest structure on Earth built by living organisms.",
        "Coral bleaching events have damaged large sections of the reef since the 1990s.",
        "The reef supports thousands of species of fish and molluscs.",
    ],
    "Trans-Siberian Railway": [
        "The Trans-Siberian Railway links the Russian capital with the Pacific port of Vladivostok.",
        "A full journey covers more than nine thousand kilometres and crosses eight time zones.",
        "Construction began in 1891 and took a quarter of a century.",
        "Branch lines reach into Mongolia and northern China.",
    ],
    "Aurora borealis": [
        "The aurora borealis appears when charged solar particles strike the upper atmosphere.",
        "Displays are most frequent in a ring around the magnetic pole.",
        "Green light comes from oxygen at about one hundred kilometres altitude.",
        "Strong geomagnetic storms push the glow far south of its usual range.",
    ],
    "Sourdough bread": [
        "Sourdough bread rises on a culture of wild yeast and lactic acid bacteria.",
        "Bakers keep the culture alive by regular feeding with flour and water.",
        "The long fermentation gives the crumb its characteristic tang.",
        "Some bakery cultures have been maintained for over a century.",
    ],
    "Mount Kilimanjaro": [
        "Mount Kilimanjaro is the highest free-standing mountain in the world.",
        "Its summit glaciers have shrunk dramatically over the past century.",
        "Climbers pass through five distinct climate zones on the ascent.",
        "The mountain is a dormant volcano with three cones.",
    ],
    "Honeybee waggle dance": [
        "Forager honeybees communicate the direction of food with a figure-eight dance.",
        "The angle of the dance encodes the bearing relative to the sun.",
        "The duration of the waggle phase signals the distance to the source.",
        "The behaviour was decoded in experiments during the 1940s.",
    ],
    "Venice canals": [
        "Venice is built on more than a hundred small islands in a lagoon.",
        "Canals serve as streets, with boats replacing cars entirely.",
        "Seasonal high tides regularly flood the lowest squares of the city.",
        "A system of movable barriers now guards the lagoon inlets.",
    ],
    "Halley's Comet": [
        "Halley's Comet returns to the inner solar system about every seventy-six years.",
        "Its appearance in 1066 was embroidered into the Bayeux Tapestry.",
        "The comet's nucleus is a dark, peanut-shaped body of ice and dust.",
        "Its next return is expected in 2061.",
    ],
    "Angkor Wat": [
        "Angkor Wat is the largest religious monument in the world by land area.",
        "It was built in the twelfth century as a state temple.",
        "The complex is surrounded by a moat nearly two hundred metres wide.",
        "Its five towers represent the peaks of a sacred mountain.",
    ],
    "Monarch butterfly migration": [
        "Monarch butterflies migrate thousands of kilometres between Canada and central Mexico.",
        "No single butterfly completes the round trip; generations relay the journey.",
        "The insects overwinter in dense clusters on mountain fir trees.",
        "Logging and habitat loss threaten the wintering sites.",
    ],
    "Gutenberg printing press": [
        "The movable-type printing press spread through Europe in the late fifteenth century.",
        "Early printed books imitated the look of handwritten manuscripts.",
        "Print shops became gathering points for scholars and merchants.",
        "Cheap printed pamphlets transformed political and religious debate.",
    ],
    "Sahara Desert": [
        "The Sahara is the largest hot desert on Earth.",
        "Rock art in its mountains records a greener past with rivers and cattle.",
        "Dust from its basins fertilizes soils as far away as the Amazon.",
        "Daytime and nighttime temperatures can differ by thirty degrees.",
    ],
    "Panama Canal": [
        "The Panama Canal cuts the sailing distance between the two oceans by thousands of kilometres.",
        "Ships are lifted over the isthmus through a series of locks.",
        "An artificial lake supplies the water that operates the lock chambers.",
        "A wider set of locks opened in 2016 for larger vessels.",
    ],
    "Chess openings": [
        "Chess opening theory catalogues thousands of named move sequences.",
        "Gambits sacrifice material early for rapid development.",
        "Modern engines have revived lines once dismissed as unsound.",
        "Top players prepare novelties many moves deep before tournaments.",
    ],
    "Glass blowing": [
        "Glass blowing shapes molten glass on the end of a hollow pipe.",
        "The craft emerged along the eastern Mediterranean two thousand years ago.",
        "Furnaces must hold the melt above a thousand degrees.",
        "Repeated reheating keeps the material workable during shaping.",
    ],
    "Coffee cultivation": [
        "Coffee grows best at altitude in the tropics, between frost and heat.",
        "The two dominant cultivated species differ sharply in taste and caffeine.",
        "Berries are picked, pulped, fermented, and dried before roasting.",
        "Leaf rust fungus periodically devastates entire growing regions.",
    ],
    "Tides": [
        "Ocean tides follow the combined pull of the moon and sun.",
        "Most coasts see two high waters a day, though some see only one.",
        "The highest tidal range on Earth exceeds fifteen metres.",
        "Tidal currents can run faster than a rowing boat in narrow straits.",
    ],
    "Morse code": [
        "Morse code encodes letters as sequences of short and long signals.",
        "Skilled operators read transmissions by ear at high speed.",
        "The distress call of three shorts, three longs, three shorts is universally known.",
        "Maritime services retired routine Morse traffic at the end of the 1990s.",
    ],
    "Icelandic geysers": [
        "Iceland's geothermal fields spout boiling water high into the air.",
        "The word geyser itself comes from an Icelandic spring's name.",
        "Eruptions occur when superheated water flashes to steam underground.",
        "Geothermal heat also warms most homes in the country.",
    ],
    "Silk Road": [
        "The Silk Road was a web of caravan routes linking China with the Mediterranean.",
        "Goods, religions, and technologies travelled in both directions.",
        "Oasis towns grew rich on the passing trade.",
        "Sea routes eventually eclipsed the overland paths.",
    ],
    "Origami": [
        "Origami folds a single square of paper into sculpture without cuts or glue.",
        "The crane is the art's most recognised traditional figure.",
        "Mathematical folding theory now informs spacecraft and medical design.",
        "Competition folders work from crease patterns of extraordinary complexity.",
    ],
    "Redwood forests": [
        "Coast redwoods are the tallest trees on Earth, exceeding one hundred metres.",
        "They harvest fog through their needles during dry summers.",
        "Some individual trees are more than two thousand years old.",
        "Less than five percent of the original old-growth forest remains.",
    ],
    "Volcanic lightning": [
        "Ash plumes from explosive eruptions can generate their own lightning.",
        "Colliding ash particles build electrical charge inside the plume.",
        "The flashes help monitors track eruptions in remote darkness.",
        "Some storms within plumes produce thousands of strikes an hour.",
    ],
    "Dead Sea": [
        "The Dead Sea lies at the lowest land elevation on Earth.",
        "Its water is nearly ten times saltier than the open ocean.",
        "Swimmers float effortlessly on the dense brine.",
        "The shoreline has been dropping by about a metre each year.",
    ],
    "Carrier pigeons": [
        "Homing pigeons navigate hundreds of kilometres back to their lofts.",
        "Armies used them to carry messages through both world wars.",
        "Several birds received medals for deliveries under fire.",
        "Their navigation appears to combine magnetic sensing with landmarks.",
    ],
    "Northern fur seals": [
        "Northern fur seals breed on a handful of cold Pacific islands.",
        "Males fast for weeks while defending beach territories.",
        "Their dense underfur once drove a ruinous commercial hunt.",
        "Pups learn to swim only weeks after birth.",
    ],
    "Stained glass": [
        "Medieval stained glass windows taught scripture to congregations who could not read.",
        "Colours come from metal oxides melted into the glass itself.",
        "Lead strips hold the cut pieces in the design.",
        "Restorers still use techniques documented eight centuries ago.",
    ],
    "Bioluminescent bays": [
        "A few sheltered bays glow blue at night when the water is disturbed.",
        "The light comes from dense blooms of single-celled dinoflagellates.",
        "Each organism flashes when jostled, an ancient startle defence.",
        "Artificial light and pollution dim the displays near towns.",
    ],
    "Alpine avalanches": [
        "Most avalanches release on slopes between thirty and forty-five degrees.",
        "Buried weak layers in the snowpack fail under the weight above.",
        "Rescue beacons transmit a signal searchers can home in on.",
        "Controlled explosions bring down unstable slopes above roads.",
    ],
    "Fermentation of tea": [
        "Dark teas gain their character from months of microbial fermentation.",
        "Pressed cakes of aged leaves were once currency along trade routes.",
        "Storage conditions change the flavour year by year.",
        "Collectors prize well-aged cakes the way others prize wine.",
    ],
    "Lighthouse keepers": [
        "Before automation, keepers tended lamps through the night in shifts.",
        "Clockwork mechanisms rotated the great lenses and had to be wound by hand.",
        "Supply boats reached offshore stations only in calm weather.",
        "The last staffed lighthouses were automated in the 1990s.",
    ],
    "Sequoia fire ecology": [
        "Giant sequoia cones open and release seed in the heat of ground fires.",
        "Thick bark insulates mature trunks from the flames.",
        "A century of fire suppression let fuels build dangerously.",
        "Managers now reintroduce controlled burns to the groves.",
    ],
    "Antarctic ice cores": [
        "Ice cores preserve air bubbles from hundreds of thousands of years ago.",
        "Layers can be counted like tree rings near the surface.",
        "Drilling camps operate through the brief polar summer.",
        "The oldest continuous core records eight hundred thousand years of climate.",
    ],
    "Harbor porpoises": [
        "Harbor porpoises are among the smallest of the toothed whales.",
        "They surface with a quick rolling motion and a puffing breath.",
        "Gillnet entanglement is their greatest hazard.",
        "Acoustic pingers on nets reduce accidental catches.",
    ],
    "Wind turbines": [
        "Modern turbine blades sweep circles wider than a football pitch.",
        "Output rises with the cube of wind speed up to a rated limit.",
        "Offshore farms reach stronger and steadier winds.",
        "Gearless designs reduce maintenance atop the towers.",
    ],
    "Paper wasps": [
        "Paper wasps chew wood fibre into the pulp that forms their nests.",
        "Each cell of the comb hangs open downward.",
        "Colonies are founded each spring by a single mated queen.",
        "Facial markings let some species recognise nestmates individually.",
    ],
    "Canal locks": [
        "A canal lock lifts boats between water levels in an enclosed chamber.",
        "Gates at each end hold back the higher pool.",
        "Gravity alone moves the water through sluices.",
        "Flights of consecutive locks climb entire hillsides.",
    ],
    "Desert varnish": [
        "Desert varnish is the dark sheen that coats exposed rock in arid lands.",
        "It accumulates over thousands of years from windblown clay and microbes.",
        "Ancient artists carved petroglyphs through the coating.",
        "Its layers can be read as a record of past climate.",
    ],
    "Murmurations": [
        "Starling flocks wheel in coordinated clouds of thousands at dusk.",
        "Each bird tracks only its half-dozen nearest neighbours.",
        "The shifting shapes confuse falcons hunting the flock.",
        "Roosts assemble the same displays night after night in winter.",
    ],
    "Maple syrup": [
        "Maple sap runs when freezing nights alternate with mild days.",
        "Roughly forty litres of sap boil down to one litre of syrup.",
        "Producers grade syrup by colour and strength of flavour.",
        "Vacuum tubing has largely replaced buckets in large sugarbushes.",
    ],
    "Mangrove forests": [
        "Mangroves grow where salt water would kill most trees.",
        "Their stilt roots trap sediment and build new land.",
        "The tangled shallows shelter juvenile fish from predators.",
        "Coastal communities rely on them as storm buffers.",
    ],
    "Pipe organs": [
        "A large pipe organ may contain tens of thousands of pipes.",
        "Ranks of pipes imitate flutes, strings, and brass.",
        "Wind pressure is held steady by regulated bellows.",
        "Organists combine ranks with drawknobs called stops.",
    ],
    "Fjords": [
        "Fjords are drowned glacial valleys with walls that plunge into the sea.",
        "A shallow sill at the mouth often traps deep, still water inside.",
        "The steep sides create some of the world's highest waterfalls.",
        "Cold-water corals thrive in their dark depths.",
    ],
    "Atacama Desert": [
        "Parts of the Atacama have recorded no rainfall in living memory.",
        "Its clear, dry skies host the world's largest telescope arrays.",
        "Salt flats there hold much of the planet's lithium.",
        "Fog-catching nets supply water to coastal settlements.",
    ],
    "Honey fungus": [
        "A single honey fungus colony can spread across square kilometres underground.",
        "One individual in Oregon ranks among the largest organisms known.",
        "Black bootlace-like cords carry the fungus between trees.",
        "It is both a feared tree killer and a forest recycler.",
    ],
    "Steel pan drums": [
        "Steel pans were first hammered from oil barrels in Trinidad.",
        "Each note is a tuned region of the concave drum surface.",
        "Bands of dozens of players perform arranged calypso and classics.",
        "The instrument emerged in the 1930s and 1940s street carnivals.",
    ],
    "Java Sea trade winds": [
        "Seasonal monsoon winds reverse direction over the Java Sea twice a year.",
        "Traditional traders timed voyages to ride each monsoon.",
        "The winds carried spices west for centuries before steamships.",
        "Modern sailors still plan passages around the reversal.",
    ],
}
